#!/bin/bash
# Seventh-pass measurement queue — capture the round-3 sampler rework:
#   1. bench.py           — new headline: full-row exact pull + approx and
#                           all-modes serving rows + monotonicity check
#   2. decode_slope 128   — post-fix sampling attribution (was 2.775 ms of
#                           a 2.904 ms step with the chunked pull)
#   3. decode_slope 256   — same at the old headline batch
#   4. gpt2m_cost_probe   — static XLA cost of the gpt2-medium step (is
#                           the 32 s/step GPT2M_INT4 reading real work or
#                           a dispatch artifact?)
#   5. topk_probe 128 672 — extend the dispatch table beyond k=64 (beam
#                           consolidation / wide-k regime)
cd /root/repo || exit 1
echo "=== queue7 start $(date) ==="

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

echo "=== [1/5] bench.py $(date) ==="
timeout 7200 python bench.py > /tmp/q7_bench.log 2>&1
rc=$?
echo "bench rc=$rc"
if [ $rc -eq 0 ]; then
  grep -E '^\{' /tmp/q7_bench.log | tail -1 > BENCH_QUEUE_r03b.json
  commit_artifacts "Record post-sampler-rework serving bench (exact+approx+all-modes)" BENCH_QUEUE_r03b.json
fi

echo "=== [2/5] decode_slope 128 $(date) ==="
DECODE_SLOPE_WAIT_MIN=20 timeout 3600 python tools/decode_slope.py 128 > /tmp/q7_slope128.log 2>&1
echo "decode_slope 128 rc=$?"
commit_artifacts "Record decode-slope batch 128 after the full-row top-k dispatch" PROFILE_DECODE_SLOPE.json

echo "=== [3/5] decode_slope 256 $(date) ==="
DECODE_SLOPE_WAIT_MIN=20 timeout 3600 python tools/decode_slope.py 256 > /tmp/q7_slope256.log 2>&1
echo "decode_slope 256 rc=$?"
commit_artifacts "Record decode-slope batch 256 after the full-row top-k dispatch" PROFILE_DECODE_SLOPE.json

echo "=== [4/5] gpt2m cost probe $(date) ==="
timeout 3600 python tools/gpt2m_cost_probe.py > /tmp/q7_gpt2m_int4.log 2>&1
echo "gpt2m int4 rc=$?"
timeout 3600 python tools/gpt2m_cost_probe.py --bf16-baseline > /tmp/q7_gpt2m_bf16.log 2>&1
echo "gpt2m bf16 rc=$?"

echo "=== [5/5] topk_probe 128 672 $(date) ==="
timeout 3600 python tools/topk_probe.py 128 672 > /tmp/q7_topk672.log 2>&1
echo "topk 672 rc=$?"
commit_artifacts "Record top-k probe at k=672 (wide-k dispatch regime)" PROBE_TOPK.jsonl

echo "=== queue7 done $(date) ==="
