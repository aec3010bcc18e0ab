#!/bin/bash
# Fifth-pass measurement queue: decode-step attribution with the ROBUST
# slope estimator (the committed batch-256 decomposition predates it and
# is biased low — see tools/decode_slope.py::slope_ms), plus the two
# decomposition probes that have not yet run on-chip:
#   * cross_decode_probe — which cross-attention formulation reads the
#     per-layer K/V fastest (einsum / flash / vpu / fused1 / module)
#   * decoder_step_probe — full/nox/dense/dense_nox split, isolating the
#     sparse cached-decode machinery vs the cross-K/V read
# Batches 128 and 512 extend the batch-scaling attribution for the
# monotonicity question (BENCH batch_scaling declines 814->706 over
# 128->1024).
cd /root/repo || exit 1
echo "=== queue5 start $(date) ==="

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

# extract_json LOGFILE OUT_JSONL: append the last {...} line of LOGFILE
extract_json() {
  grep -E '^\{.*\}$' "$1" | tail -1 >> "$2"
}

echo "=== [1/5] decode_slope 256 (robust estimator) $(date) ==="
DECODE_SLOPE_WAIT_MIN=25 timeout 5400 python tools/decode_slope.py 256 > /tmp/q5_slope256.log 2>&1
echo "decode_slope 256 rc=$?"
commit_artifacts "Re-measure decode-slope batch 256 with the robust estimator" PROFILE_DECODE_SLOPE.json

echo "=== [2/5] cross_decode_probe 256 $(date) ==="
timeout 3600 python tools/cross_decode_probe.py 256 > /tmp/q5_cross.log 2>&1
echo "cross_decode_probe rc=$?"
extract_json /tmp/q5_cross.log PROBE_CROSS_DECODE.jsonl
commit_artifacts "Record cross-attention decode formulation probe" PROBE_CROSS_DECODE.jsonl

echo "=== [3/5] decoder_step_probe 256 $(date) ==="
timeout 3600 python tools/decoder_step_probe.py 256 > /tmp/q5_step.log 2>&1
echo "decoder_step_probe rc=$?"
extract_json /tmp/q5_step.log PROBE_DECODER_STEP.jsonl
commit_artifacts "Record decoder-step decomposition probe" PROBE_DECODER_STEP.jsonl

echo "=== [4/6] decode_slope 128 $(date) ==="
DECODE_SLOPE_WAIT_MIN=15 timeout 3600 python tools/decode_slope.py 128 > /tmp/q5_slope128.log 2>&1
echo "decode_slope 128 rc=$?"
echo "=== [5/6] decode_slope 512 $(date) ==="
DECODE_SLOPE_WAIT_MIN=15 timeout 3600 python tools/decode_slope.py 512 > /tmp/q5_slope512.log 2>&1
echo "decode_slope 512 rc=$?"
commit_artifacts "Record decode-slope batch 128/512 for scaling attribution" PROFILE_DECODE_SLOPE.json

echo "=== [6/8] gpt2m int4 (slope timing) $(date) ==="
GPT2M_WAIT_MIN=20 timeout 5400 python tools/bench_gpt2_medium_int4.py > /tmp/q5_int4.log 2>&1
echo "int4 rc=$?"
echo "=== [7/8] gpt2m bf16 baseline (slope timing) $(date) ==="
GPT2M_WAIT_MIN=15 timeout 4200 python tools/bench_gpt2_medium_int4.py --bf16-baseline > /tmp/q5_bf16.log 2>&1
echo "bf16-baseline rc=$?"
commit_artifacts "Record gpt2-medium int4 vs bf16 slope-timed step times" GPT2M_INT4.json

echo "=== [8/8] bench.py (post-sampler-fix serving headline) $(date) ==="
timeout 7200 python bench.py > /tmp/q5_bench.log 2>&1
rc=$?
echo "bench rc=$rc"
extract_json /tmp/q5_bench.log BENCH_QUEUE_r03.json.new
if [ $rc -eq 0 ] && [ -s BENCH_QUEUE_r03.json.new ]; then
  tail -1 BENCH_QUEUE_r03.json.new > BENCH_QUEUE_r03.json
fi
rm -f BENCH_QUEUE_r03.json.new
commit_artifacts "Record serving bench after the sampler fix" BENCH_QUEUE_r03.json
echo "=== queue5 done $(date) ==="
