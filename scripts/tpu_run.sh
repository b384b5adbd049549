#!/bin/bash
# Run a python script against the TPU with wedge-retry: the axon tunnel
# intermittently hangs a fresh process right after a previous TPU process
# exits; waiting ~60s and retrying recovers it.
#   scripts/tpu_run.sh <timeout_s> <script> [args...]
T=$1; shift
for attempt in 1 2 3; do
  PYTHONPATH=/root/repo:$PYTHONPATH timeout "$T" python -u "$@"
  rc=$?
  if [ $rc -ne 124 ] && [ $rc -ne 143 ]; then
    exit $rc
  fi
  echo "[tpu_run] attempt $attempt timed out (rc=$rc); cooling down 60s" >&2
  sleep 60
done
exit 124
