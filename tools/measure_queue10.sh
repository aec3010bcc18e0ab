#!/bin/bash
# Tenth-pass measurement queue — after the one-hot static gather/scatter
# rewrite of the sparse-block reassembly (ops/static_gather.py):
#   1. encoder_block_probe 256 — new scatter_onehot variant + the full
#                                block (now routed through the matmul
#                                path), plus attn sub-attribution
#                                (attn_linear / attn_sdpa)
#   2. encoder_phase_probe 256 — stack-level encoder ms after the change
#   3. bench.py              — end-to-end serving captions/s
cd /root/repo || exit 1
echo "=== queue10 start $(date) ==="

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

echo "=== [1/3] bench.py $(date) ==="
timeout 5400 python bench.py > /tmp/q10_bench.log 2>&1
echo "bench rc=$?"
# bench.py prints its JSON line to stdout only — capture it into the artifact
grep -o '^{.*}$' /tmp/q10_bench.log | tail -1 > BENCH_QUEUE_r03c.json
commit_artifacts "Record serving bench after one-hot sparse reassembly" BENCH_QUEUE_r03c.json BENCH_r03.json

echo "=== [2/3] encoder_block_probe 256 $(date) ==="
PHASE_PROBE_WAIT_MIN=20 timeout 2700 python tools/encoder_block_probe.py 256 > /tmp/q10_block256.log 2>&1
echo "block probe rc=$?"
commit_artifacts "Record block attribution after one-hot reassembly (scatter_onehot, attn split)" PROFILE_ENC_BLOCK.json

echo "=== [3/3] encoder_phase_probe 256 $(date) ==="
PHASE_PROBE_WAIT_MIN=20 timeout 2700 python tools/encoder_phase_probe.py 256 > /tmp/q10_encoder256.log 2>&1
echo "encoder probe rc=$?"
commit_artifacts "Record encoder stack timing after one-hot reassembly" PROFILE_ENCODER.json

echo "=== queue10 done $(date) ==="
