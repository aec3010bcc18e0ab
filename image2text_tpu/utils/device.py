"""Per-chip hardware constants keyed off jax device_kind.

Shared by the bench/profiling tools so plausibility ceilings and MFU
denominators always derive from the device actually attached instead of a
hardcoded chip generation.
"""
from __future__ import annotations

# bf16 peak FLOP/s per chip, by device_kind substring (public specs).
# Order matters: "v5 lite" (v5e) must match before plain "v5" (v5p).
PEAK_BF16 = [
    ("v5 lite", 197e12),   # TPU v5e (device_kind "TPU v5 lite")
    ("v5e", 197e12),
    ("v5p", 459e12),
    ("v5", 459e12),
    ("v6", 918e12),        # Trillium
    ("v4", 275e12),
    ("v3", 123e12),
    ("v2", 46e12),
]


def chip_peak_bf16_flops(device) -> float:
    """bf16 peak FLOP/s for a jax device; defaults to v5e if unrecognised."""
    kind = getattr(device, "device_kind", "").lower()
    for sub, peak in PEAK_BF16:
        if sub in kind:
            return peak
    return 197e12
