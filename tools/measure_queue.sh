#!/bin/bash
# Serialized TPU measurement queue (round-3 VERDICT items 2, 3, 5, 6).
#
# The pooled TPU tunnel degrades in phases and sometimes dies entirely;
# measurements therefore run as a serialized queue (single-core host —
# see tests/conftest.py) that a watcher relaunches whenever the tunnel
# answers again.  Ordered by value-per-healthy-minute: the headline
# serving bench first, then the flash-dropout smoke, training bench,
# kernel sweep (resumable via persisted samples), decode slope, int4.
# Each tool has its own calibration gate; WAIT_MIN budgets bound
# waiting-room time only.
#
# After every item the produced repo artifact is committed immediately:
# a healthy window can close (or the tunnel die) before the queue
# finishes, and a committed partial result beats an uncommitted full
# one.
cd /root/repo || exit 1
echo "=== queue start $(date) ==="

ARTIFACTS="BENCH_QUEUE_r03.json BENCH_TRAIN.json BENCH_KERNELS.json \
PROFILE_DECODE_SLOPE.json GPT2M_INT4.json"

commit_artifacts() {
  # commit only measurement artifacts (pathspec-scoped so source changes
  # a concurrent session may have staged are never swept in); build the
  # pathspec from files that exist so git never errors on a missing one
  local paths=""
  for f in $ARTIFACTS; do [ -e "$f" ] && paths="$paths $f"; done
  [ -n "$paths" ] || return 0
  if [ -n "$(git status --porcelain -- $paths)" ]; then
    git add -- $paths
    git commit -m "$1" -- $paths
  fi
}

echo "=== [1/6] bench.py (headline serving) $(date) ==="
BENCH_WAIT_MIN=30 timeout 7200 python bench.py > /tmp/q_bench.log 2>&1
rc=$?
echo "bench rc=$rc"
if [ $rc -eq 0 ]; then
  grep '^{' /tmp/q_bench.log | tail -1 > BENCH_QUEUE_r03.json
  commit_artifacts "Record queued on-chip serving bench (BENCH_QUEUE_r03)"
fi

echo "=== [2/6] flash dropout on-chip smoke $(date) ==="
timeout 1200 python tools/flash_dropout_smoke.py > /tmp/q_flashdrop.log 2>&1
echo "flash_dropout rc=$?"

echo "=== [3/6] bench_train $(date) ==="
BENCH_TRAIN_WAIT_MIN=45 timeout 7200 python bench_train.py > /tmp/q_train.log 2>&1
rc=$?
echo "bench_train rc=$rc"
if [ $rc -eq 0 ]; then
  grep '^{' /tmp/q_train.log | tail -1 > BENCH_TRAIN.json
  commit_artifacts "Record on-chip training-throughput bench (BENCH_TRAIN)"
fi

echo "=== [4/6] bench_kernels $(date) ==="
KERNEL_BENCH_WAIT_MIN=90 timeout 9000 python bench_kernels.py > /tmp/q_kernels.log 2>&1
rc=$?
echo "bench_kernels rc=$rc"
[ $rc -eq 0 ] && commit_artifacts "Record on-chip kernel sweep (BENCH_KERNELS)"

echo "=== [5/6] decode_slope $(date) ==="
DECODE_SLOPE_WAIT_MIN=30 timeout 5400 python tools/decode_slope.py 256 > /tmp/q_slope.log 2>&1
echo "decode_slope 256 rc=$?"
DECODE_SLOPE_WAIT_MIN=15 timeout 4200 python tools/decode_slope.py 1024 > /tmp/q_slope1024.log 2>&1
echo "decode_slope 1024 rc=$?"
commit_artifacts "Record on-chip decode-slope profiles"

echo "=== [6/6] gpt2m int4 $(date) ==="
GPT2M_WAIT_MIN=30 timeout 5400 python tools/bench_gpt2_medium_int4.py > /tmp/q_int4.log 2>&1
echo "int4 rc=$?"
GPT2M_WAIT_MIN=20 timeout 4200 python tools/bench_gpt2_medium_int4.py --bf16-baseline > /tmp/q_bf16.log 2>&1
echo "bf16-baseline rc=$?"
commit_artifacts "Record on-chip gpt2-medium int4 vs bf16 step times"
echo "=== queue done $(date) ==="
