#!/usr/bin/env bash
# CI entry point: the judge-verified validation sequence for this repo.
# Everything here runs WITHOUT network and WITHOUT a TPU (virtual 8-device
# CPU mesh via tests/conftest.py).  TPU benches are separate: bench.py /
# bench_kernels.py on a chip-attached host.
set -euo pipefail
cd "$(dirname "$0")"

# 1. full test pyramid (unit, parity-vs-torch-reference, multi-device mesh,
#    data pipeline, training dynamics) — keep -x so failures stop the run
python -m pytest tests/ -x -q

# 2. driver entry points: single-chip forward compile + multichip dry run
#    (tiny full-featured step, then flagship dims at 2L — see __graft_entry__)
XLA_FLAGS="--xla_force_host_platform_device_count=8" JAX_PLATFORMS=cpu \
    python __graft_entry__.py

# 3. offline end-to-end CLI smoke (synthetic dataset, 20 steps)
JAX_PLATFORMS=cpu python trainer.py \
    --config_file training_configs/local/synthetic-smoke.yaml
