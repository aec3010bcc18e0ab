#!/bin/bash
# Second-pass measurement queue: the items measure_queue.sh could not
# land on a healthy tunnel window (round-3 VERDICT items 2, 3, 6).
# Run while a calibration probe reads >=100 TFLOP/s sustained.
cd /root/repo || exit 1
echo "=== queue2 start $(date) ==="

ARTIFACTS="BENCH_KERNELS.json PROFILE_DECODE_SLOPE.json GPT2M_INT4.json"

commit_artifacts() {
  local paths=""
  for f in $ARTIFACTS; do [ -e "$f" ] && paths="$paths $f"; done
  [ -n "$paths" ] || return 0
  if [ -n "$(git status --porcelain -- $paths)" ]; then
    git add -- $paths
    git commit -m "$1" -- $paths
  fi
}

echo "=== [1/3] bench_kernels $(date) ==="
KERNEL_BENCH_WAIT_MIN=60 timeout 9000 python bench_kernels.py > /tmp/q2_kernels.log 2>&1
rc=$?
echo "bench_kernels rc=$rc"
[ $rc -eq 0 ] && commit_artifacts "Record on-chip kernel sweep (BENCH_KERNELS)"

echo "=== [2/3] decode_slope $(date) ==="
DECODE_SLOPE_WAIT_MIN=20 timeout 5400 python tools/decode_slope.py 256 > /tmp/q2_slope.log 2>&1
echo "decode_slope 256 rc=$?"
DECODE_SLOPE_WAIT_MIN=10 timeout 4200 python tools/decode_slope.py 1024 > /tmp/q2_slope1024.log 2>&1
echo "decode_slope 1024 rc=$?"
commit_artifacts "Record on-chip decode-slope profiles (healthy window)"

echo "=== [3/3] gpt2m int4 $(date) ==="
GPT2M_WAIT_MIN=20 timeout 5400 python tools/bench_gpt2_medium_int4.py > /tmp/q2_int4.log 2>&1
echo "int4 rc=$?"
GPT2M_WAIT_MIN=15 timeout 4200 python tools/bench_gpt2_medium_int4.py --bf16-baseline > /tmp/q2_bf16.log 2>&1
echo "bf16-baseline rc=$?"
commit_artifacts "Record on-chip gpt2-medium int4 vs bf16 step times (healthy window)"
echo "=== queue2 done $(date) ==="
