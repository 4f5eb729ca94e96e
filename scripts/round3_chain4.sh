#!/bin/bash
# Round-3 perf queue: runs after round3_chain3.sh completes.
# Throughput probe over {model.apply, BN-folded serving, +Pallas} x
# batch sizes — decides whether bench.py should ship the folded serving
# path and/or a larger batch for the round-end headline number.
# Usage: scripts/round3_chain4.sh [CHAIN3_PID]
set -u
PREV_PID="${1:-}"
cd "$(dirname "$0")/.."
PIDFILE=/tmp/tpu-chain-round3d.pid
echo $$ > "$PIDFILE"
trap 'rm -f "$PIDFILE"' EXIT

log() { echo "[chain4 $(date '+%H:%M:%S')] $*"; }

if [ -n "$PREV_PID" ]; then
    log "waiting for chain3 pid=$PREV_PID"
    while kill -0 "$PREV_PID" 2>/dev/null; do sleep 60; done
fi
log "chain3 done"

log "throughput probe: inference path x batch size"
timeout -k 30 3600 python scripts/bench_probe.py 1024 2048 4096
log "probe rc=$?"

log "chain4 complete"
