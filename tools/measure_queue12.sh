#!/bin/bash
# Twelfth-pass measurement queue — after (a) the exact threshold-gather
# top-k sampler (gathered_top_k: block-max reduce + one-hot MXU gather +
# narrow sort, 2.5x over the full-row pull), (b) the MoE FFN compute-dtype
# cast fix (f32 intermediate dropped), and (c) bf16 scores materialisation
# in the XLA SDPA path (torch math-backend form).  bench.py for this code
# state runs separately (BENCH_QUEUE_r03e.json); this queue captures the
# attribution artifacts:
#   1. decode_slope 256      — decode-step decomposition with the new sampler
#   2. decode_slope 1024     — large-batch scaling attribution
#   3. encoder_phase_probe 256 — stack-level encoder ms after bf16 scores
#   4. bench_train.py        — train step (MoE cast + bf16 scores are in the
#                              training graph's XLA-SDPA fallback paths)
cd /root/repo || exit 1
echo "=== queue12 start $(date) ==="

commit_artifacts() {
  local msg="$1"; shift
  local paths=""
  for f in "$@"; do [ -e "$f" ] && paths="$paths $f"; done
  [ -n "$paths" ] || return 0
  if [ -n "$(git status --porcelain -- $paths)" ]; then
    git add -- $paths
    git commit -m "$msg" -- $paths
  fi
}

echo "=== [1/4] decode_slope 256 $(date) ==="
DECODE_SLOPE_WAIT_MIN=30 timeout 3600 python tools/decode_slope.py 256 > /tmp/q12_slope256.log 2>&1
echo "slope256 rc=$?"
commit_artifacts "Record decode-slope batch 256 after gathered top-k sampler" PROFILE_DECODE_SLOPE.json

echo "=== [2/4] decode_slope 1024 $(date) ==="
DECODE_SLOPE_WAIT_MIN=30 timeout 3600 python tools/decode_slope.py 1024 > /tmp/q12_slope1024.log 2>&1
echo "slope1024 rc=$?"
commit_artifacts "Record decode-slope batch 1024 after gathered top-k sampler" PROFILE_DECODE_SLOPE.json

echo "=== [3/4] encoder_phase_probe 256 $(date) ==="
PHASE_PROBE_WAIT_MIN=20 timeout 2700 python tools/encoder_phase_probe.py 256 > /tmp/q12_encoder256.log 2>&1
echo "encoder probe rc=$?"
commit_artifacts "Record encoder stack timing after bf16-scores SDPA + MoE cast fix" PROFILE_ENCODER.json

echo "=== [4/4] bench_train.py $(date) ==="
timeout 5400 python bench_train.py > /tmp/q12_train.log 2>&1
echo "train bench rc=$?"
grep -o '^{.*}$' /tmp/q12_train.log | tail -1 > /tmp/q12_train.json
if [ -s /tmp/q12_train.json ]; then cp /tmp/q12_train.json BENCH_TRAIN.json; fi
commit_artifacts "Record train-step bench after MoE cast fix + bf16-scores SDPA" BENCH_TRAIN.json

echo "=== queue12 done $(date) ==="
