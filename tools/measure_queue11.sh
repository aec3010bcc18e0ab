#!/bin/bash
# Eleventh-pass measurement queue — after (a) lazy sparse layout threading
# (TransformerBlock want_lazy: consecutive sparse blocks skip the per-block
# combine permutation; encoder reassembles only the CLS rows, decoder once
# before ln_f) and (b) the MoE combine-fold (MoELinear contracts expert+proj
# axes in one einsum — the (..., e, out) per-expert output intermediate is
# never materialised):
#   1. bench.py              — end-to-end serving captions/s
#   2. encoder_phase_probe 256 — stack-level encoder ms after the change
#   3. bench_train.py        — train-step throughput (lazy layout is also
#                              in the remat'd training graph)
cd /root/repo || exit 1
echo "=== queue11 start $(date) ==="

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
timeout 5400 python bench.py > /tmp/q11_bench.log 2>&1
echo "bench rc=$?"
grep -o '^{.*}$' /tmp/q11_bench.log | tail -1 > BENCH_QUEUE_r03d.json
commit_artifacts "Record serving bench after lazy sparse layout + MoE combine-fold" BENCH_QUEUE_r03d.json BENCH_r03.json

echo "=== [2/3] encoder_phase_probe 256 $(date) ==="
PHASE_PROBE_WAIT_MIN=20 timeout 2700 python tools/encoder_phase_probe.py 256 > /tmp/q11_encoder256.log 2>&1
echo "encoder probe rc=$?"
commit_artifacts "Record encoder stack timing after lazy layout + MoE fold" PROFILE_ENCODER.json

echo "=== [3/3] bench_train.py $(date) ==="
timeout 5400 python bench_train.py > /tmp/q11_train.log 2>&1
echo "train bench rc=$?"
grep -o '^{.*}$' /tmp/q11_train.log | tail -1 > /tmp/q11_train.json
if [ -s /tmp/q11_train.json ]; then cp /tmp/q11_train.json BENCH_TRAIN.json; fi
commit_artifacts "Record train-step bench after lazy layout + MoE fold" BENCH_TRAIN.json

echo "=== queue11 done $(date) ==="
