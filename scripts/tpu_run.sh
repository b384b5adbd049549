#!/bin/bash
# Run a python script against the TPU with wedge-retry. The axon tunnel
# can hang a process at startup OR inside any RPC (including remote
# compiles) — when healthy, even a fully cold fused-step compile takes
# <60 s, so a process that has produced NO non-warning output after 300 s
# is treated as wedged, killed, and retried after a cool-down. Do NOT
# judge by host CPU (compiles run remotely at ~0 host CPU); scripts
# should print a progress line before/between compile points.
#   scripts/tpu_run.sh <timeout_s> <script> [args...]
T=$1; shift

kill_tree() {  # kill a PID and all its descendants (by pid, not pattern)
  local p c
  p=$1
  for c in $(pgrep -P "$p" 2>/dev/null); do kill_tree "$c"; done
  kill "$p" 2>/dev/null
}

for attempt in 1 2 3 4; do
  tmp=$(mktemp /tmp/tpu_run.XXXXXX)
  ( PYTHONPATH=/root/repo:$PYTHONPATH timeout "$T" python -u "$@" \
      2>&1; echo "$?" > "$tmp.rc" ) | tee "$tmp" &
  wpid=$!
  wedged=0
  waited=0
  while kill -0 "$wpid" 2>/dev/null; do
    sleep 15
    waited=$((waited + 15))
    if [ "$waited" -ge 300 ] && [ $((waited % 60)) -eq 0 ]; then
      # NOTE: grep -c prints 0 AND exits 1 on no match — appending
      # `|| echo 0` here would make $lines the two-line string "0\n0"
      # and break the -eq test (the wedge detector would never fire)
      lines=$(grep -cv -e WARNING -e "^$" "$tmp" 2>/dev/null)
      if [ "${lines:-0}" -eq 0 ]; then
        echo "[tpu_run] attempt $attempt: no output after ${waited}s — wedged; killing" >&2
        kill_tree "$wpid"
        wedged=1
        break
      fi
    fi
  done
  wait "$wpid" 2>/dev/null
  rc=$(cat "$tmp.rc" 2>/dev/null || echo 143)
  rm -f "$tmp" "$tmp.rc"
  if [ "$wedged" -eq 0 ] && [ "$rc" != "124" ] && [ "$rc" != "143" ]; then
    exit "$rc"
  fi
  echo "[tpu_run] attempt $attempt failed (rc=$rc wedged=$wedged); cooling down 120s" >&2
  sleep 120
done
exit 124
