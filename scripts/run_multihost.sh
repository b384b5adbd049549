#!/bin/bash
# Multi-host fusion smoke: N jax.distributed processes (default 2), each
# with 4 virtual CPU devices, running the sharded fusion step over one
# global (stream, space) mesh. Writes per-process digests and checks that
# the 2-process run reproduces the single-process baseline EXACTLY.
#
#   scripts/run_multihost.sh [num_processes] [out_dir]
set -e
N=${1:-2}
OUT=${2:-/tmp/rgdf_multihost}
PORT=${MULTIHOST_PORT:-$((12400 + RANDOM % 200))}
mkdir -p "$OUT"
export PYTHONPATH=/root/repo:$PYTHONPATH

echo "[run_multihost] baseline: 1 process x $((4 * N)) devices"
python -u examples/run_multihost.py --num-processes 1 \
  --devices-per-process $((4 * N)) --digest-out "$OUT/base.json"

echo "[run_multihost] distributed: $N processes x 4 devices (port $PORT)"
pids=()
for ((i = 0; i < N; i++)); do
  python -u examples/run_multihost.py \
    --coordinator "localhost:$PORT" \
    --num-processes "$N" --process-id "$i" \
    --devices-per-process 4 \
    --digest-out "$OUT/dist.json" &
  pids+=($!)
done
rc=0
for p in "${pids[@]}"; do wait "$p" || rc=$?; done
[ $rc -ne 0 ] && { echo "[run_multihost] worker failed rc=$rc"; exit $rc; }

python - "$OUT" <<'EOF'
import json, sys
out = sys.argv[1]
base = json.load(open(f"{out}/base.json"))
dist = json.load(open(f"{out}/dist.json"))
keys = ["fused_total", "raw_total", "occ_sum", "fused_rows_sha", "occ_sha"]
for k in keys:
    assert base[k] == dist[k], (k, base[k], dist[k])
print("[run_multihost] OK — distributed run bit-identical to baseline:",
      {k: base[k] for k in keys[:3]})
EOF
