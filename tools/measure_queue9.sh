#!/bin/bash
# Ninth-pass measurement queue — encoder attribution (the encoder is
# ~105 ms of the 226 ms batch-256 caption latency, ~22% MFU):
#   1. encoder_phase_probe 256 — conv / proj / blocks split, flash-vs-XLA
#                                at the serving encoder's shape, and the
#                                sparse-machinery cost vs a dense twin
cd /root/repo || exit 1
echo "=== queue9 start $(date) ==="

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

echo "=== [1/1] encoder_phase_probe 256 $(date) ==="
PHASE_PROBE_WAIT_MIN=25 timeout 3600 python tools/encoder_phase_probe.py 256 > /tmp/q9_encoder256.log 2>&1
echo "encoder probe rc=$?"
commit_artifacts "Record encoder sub-attribution (conv/proj/blocks, flash, dense twin)" PROFILE_ENCODER.json

echo "=== queue9 done $(date) ==="
