#!/bin/bash
# Eighth-pass measurement queue — attribute the remaining serving time:
#   1. caption_phase_probe 256 — preproc / encoder / prefill slopes (the
#                                ~109 ms of the 226 ms batch-256 caption
#                                latency that is not the decode loop)
#   2. decode_slope 512        — healthy-window decode decomposition at the
#                                first declining batch size
#   3. decode_slope 1024       — same at the largest benched batch (the
#                                batch-scaling non-monotonicity attribution)
cd /root/repo || exit 1
echo "=== queue8 start $(date) ==="

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

echo "=== [1/3] caption_phase_probe 256 $(date) ==="
PHASE_PROBE_WAIT_MIN=25 timeout 3600 python tools/caption_phase_probe.py 256 > /tmp/q8_phases256.log 2>&1
echo "phase probe rc=$?"
commit_artifacts "Record caption phase attribution (preproc/encoder/prefill) batch 256" PROFILE_PHASES.json

echo "=== [2/3] decode_slope 512 $(date) ==="
DECODE_SLOPE_WAIT_MIN=25 timeout 3600 python tools/decode_slope.py 512 > /tmp/q8_slope512.log 2>&1
echo "decode_slope 512 rc=$?"
commit_artifacts "Record healthy-window decode slope at batch 512" PROFILE_DECODE_SLOPE.json

echo "=== [3/3] decode_slope 1024 $(date) ==="
DECODE_SLOPE_WAIT_MIN=25 timeout 3600 python tools/decode_slope.py 1024 > /tmp/q8_slope1024.log 2>&1
echo "decode_slope 1024 rc=$?"
commit_artifacts "Record healthy-window decode slope at batch 1024" PROFILE_DECODE_SLOPE.json

echo "=== queue8 done $(date) ==="
