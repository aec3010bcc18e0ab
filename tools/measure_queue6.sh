#!/bin/bash
# Sixth-pass measurement queue (the VM restart killed queue5 after item 3):
#   * decode_slope 128 and 512 — extend the batch-scaling attribution for
#     the monotonicity question (BENCH batch_scaling declines 814->706
#     over 128->1024; 256 is committed, 128/512 were lost with the VM)
# bench.py re-runs in a LATER queue so it captures any decode fixes that
# land from the static cost probe first.
cd /root/repo || exit 1
echo "=== queue6 start $(date) ==="

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

echo "=== [1/2] decode_slope 128 $(date) ==="
DECODE_SLOPE_WAIT_MIN=20 timeout 3600 python tools/decode_slope.py 128 > /tmp/q6_slope128.log 2>&1
echo "decode_slope 128 rc=$?"
commit_artifacts "Record decode-slope batch 128 for scaling attribution" PROFILE_DECODE_SLOPE.json

echo "=== [2/2] decode_slope 512 $(date) ==="
DECODE_SLOPE_WAIT_MIN=20 timeout 3600 python tools/decode_slope.py 512 > /tmp/q6_slope512.log 2>&1
echo "decode_slope 512 rc=$?"
commit_artifacts "Record decode-slope batch 512 for scaling attribution" PROFILE_DECODE_SLOPE.json

echo "=== queue6 done $(date) ==="
