#!/bin/bash
# Third-pass measurement queue (round-3 VERDICT items 2, 3, 6).
# Reordered: decode-slope first — its result unblocks decode optimization
# work — then the kernel sweep, then gpt2-medium int4 vs bf16.
# Each tool gates on a sustained-matmul calibration window internally.
cd /root/repo || exit 1
echo "=== queue3 start $(date) ==="

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
DECODE_SLOPE_WAIT_MIN=25 timeout 5400 python tools/decode_slope.py 256 > /tmp/q3_slope256.log 2>&1
echo "decode_slope 256 rc=$?"
commit_artifacts "Record on-chip decode-slope profile batch 256 (healthy window)" PROFILE_DECODE_SLOPE.json

echo "=== [2/4] decode_slope 1024 $(date) ==="
DECODE_SLOPE_WAIT_MIN=15 timeout 4200 python tools/decode_slope.py 1024 > /tmp/q3_slope1024.log 2>&1
echo "decode_slope 1024 rc=$?"
commit_artifacts "Record on-chip decode-slope profile batch 1024 (healthy window)" PROFILE_DECODE_SLOPE.json

echo "=== [3/4] bench_kernels $(date) ==="
KERNEL_BENCH_WAIT_MIN=90 timeout 10800 python bench_kernels.py > /tmp/q3_kernels.log 2>&1
rc=$?
echo "bench_kernels rc=$rc"
[ $rc -eq 0 ] && commit_artifacts "Record on-chip kernel sweep (BENCH_KERNELS)" BENCH_KERNELS.json

echo "=== [4/4] gpt2m int4 $(date) ==="
GPT2M_WAIT_MIN=20 timeout 5400 python tools/bench_gpt2_medium_int4.py > /tmp/q3_int4.log 2>&1
echo "int4 rc=$?"
GPT2M_WAIT_MIN=15 timeout 4200 python tools/bench_gpt2_medium_int4.py --bf16-baseline > /tmp/q3_bf16.log 2>&1
echo "bf16-baseline rc=$?"
commit_artifacts "Record on-chip gpt2-medium int4 vs bf16 step times (healthy window)" GPT2M_INT4.json
echo "=== queue3 done $(date) ==="
