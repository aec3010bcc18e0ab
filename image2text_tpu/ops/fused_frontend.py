"""Fused encoder front-end Pallas kernel (serving path).

The flagship encoder's post-conv prelude — patch projector (2048->1024),
LayerNormND over the whole (256, 1024) token slab, +positional table,
the SECOND LayerNormND, and the [CLS; tokens] concat
(models/encoder.py::VisionTransformerEncoder.forward, reference
encoder.py:145-170 raw-reshape semantics) — costs ~3.6 ms at batch 256
(PROFILE_ENCODER.json ``proj`` rows) against a ~1.4 ms matmul floor: XLA
materialises the projector output, both LN-ND passes and the pos-add
through HBM.  This kernel runs the whole prelude per image tile in VMEM:
one read of the patch stream, one write of the block-loop input stream.

Numerics mirror the modules exactly (Linear's f32-accumulated dot cast
to storage dtype, LayerNormND's f32 slab statistics, pos-emb cast to the
stream dtype before the add); interpret-mode parity is pinned by
tests/test_fused_block.py.

Scope: eval only (no dropout, no VJP), plain projector params,
lane/sublane-aligned dims; everything else falls back to the XLA
composition.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from image2text_tpu.ops.fused_moe import _dot


def _ln_nd(x, w, b):
    """LayerNormND numerics: f32 stats over the WHOLE (t, d) slab."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32)
    var = jnp.mean(jnp.square(x32 - mean))
    y = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
    y = y * w.astype(jnp.float32) + b.astype(jnp.float32)
    return y.astype(x.dtype)


def _frontend_kernel(x_ref, wp_ref, bp_ref, lnw_ref, lnb_ref, wpe_ref,
                     cls_ref, o_ref, *, b_tile: int, n_cls: int):
    dt = x_ref.dtype
    wp = wp_ref[...]
    bp = bp_ref[...]
    lnw = lnw_ref[...]
    lnb = lnb_ref[...]
    wpe = wpe_ref[...]
    for i in range(b_tile):
        z = _dot(x_ref[i], wp, dt) + bp            # (t, d) projector
        z = _ln_nd(z, lnw, lnb)                    # ln_input(proj(x))
        y = z + wpe                                # + positional table
        o_ref[i, :n_cls] = cls_ref[...]
        o_ref[i, n_cls:] = _ln_nd(y, lnw, lnb)     # ln_input(y) again


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _run(b_tile, n_cls, interpret, x, wp, bp, lnw, lnb, wpe, cls):
    b, t, din = x.shape
    d = wp.shape[1]
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim)
    return pl.pallas_call(
        functools.partial(_frontend_kernel, b_tile=b_tile, n_cls=n_cls),
        grid=(b // b_tile,),
        in_specs=[pl.BlockSpec((b_tile, t, din), lambda i: (i, 0, 0)),
                  full(wp), full(bp), full(lnw), full(lnb), full(wpe),
                  full(cls)],
        out_specs=pl.BlockSpec((b_tile, n_cls + t, d), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n_cls + t, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x, wp, bp, lnw, lnb, wpe, cls)


def fused_frontend_compatible(enc, p, x_patches,
                              interpret: bool = False
                              ) -> Optional[jax.Array]:
    """Dispatch gate: the (b, t, input_d) raw-reshaped patch stream ->
    the (b, n_cls + t, d) block-loop input, or None (XLA path)."""
    if x_patches.dtype not in (jnp.bfloat16, jnp.float32):
        return None
    if not interpret and (jax.default_backend() != "tpu"
                          or x_patches.dtype != jnp.bfloat16):
        return None
    pp = p["projector"]
    if not set(pp) <= {"weight", "bias"}:
        return None
    b, t, din = x_patches.shape
    d = enc.out_dim
    n_cls = enc.n_cls
    if d % 128 or din % 128 or t % 8 or n_cls % 8:
        return None
    if tuple(p["ln_input"]["weight"].shape) != (t, d):
        return None
    b_tile = 4
    while b_tile > 1 and b % b_tile:
        b_tile //= 2
    if b % b_tile:
        return None
    dt = x_patches.dtype
    wp = pp["weight"].T.astype(dt)
    bp = (pp["bias"].reshape(1, d).astype(dt) if "bias" in pp
          else jnp.zeros((1, d), dt))
    lnw = p["ln_input"]["weight"]
    lnb = (p["ln_input"]["bias"] if "bias" in p["ln_input"]
           else jnp.zeros((t, d), jnp.float32))
    wpe = p["transformer"]["wpe"]["weight"].astype(dt)
    cls = p["cls_token"].reshape(n_cls, d).astype(dt)
    return _run(b_tile, n_cls, interpret, x_patches, wp, bp, lnw, lnb,
                wpe, cls)
