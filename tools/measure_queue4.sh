#!/bin/bash
# Fourth-pass measurement queue: the items queue3 did not land on a healthy
# window — decision-grade kernel sweep, batch-1024 decode slope, and the
# gpt2-medium int4 vs bf16 step-time pair. Each tool gates on a sustained-
# matmul calibration window internally; artifacts are committed as they land.
cd /root/repo || exit 1
echo "=== queue4 start $(date) ==="

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

echo "=== [1/4] bench_kernels $(date) ==="
KERNEL_BENCH_WAIT_MIN=60 timeout 9000 python bench_kernels.py > /tmp/q4_kernels.log 2>&1
rc=$?
echo "bench_kernels rc=$rc"
commit_artifacts "Record on-chip kernel sweep (BENCH_KERNELS)" BENCH_KERNELS.json

echo "=== [2/4] decode_slope 1024 $(date) ==="
DECODE_SLOPE_WAIT_MIN=20 timeout 4200 python tools/decode_slope.py 1024 > /tmp/q4_slope1024.log 2>&1
echo "decode_slope 1024 rc=$?"
commit_artifacts "Record decode-slope profile batch 1024" PROFILE_DECODE_SLOPE.json

echo "=== [3/4] gpt2m int4 $(date) ==="
GPT2M_WAIT_MIN=20 timeout 5400 python tools/bench_gpt2_medium_int4.py > /tmp/q4_int4.log 2>&1
echo "int4 rc=$?"
echo "=== [4/4] gpt2m bf16 baseline $(date) ==="
GPT2M_WAIT_MIN=15 timeout 4200 python tools/bench_gpt2_medium_int4.py --bf16-baseline > /tmp/q4_bf16.log 2>&1
echo "bf16-baseline rc=$?"
commit_artifacts "Record gpt2-medium int4 vs bf16 step times" GPT2M_INT4.json
echo "=== queue4 done $(date) ==="
