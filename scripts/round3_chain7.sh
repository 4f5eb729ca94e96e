#!/bin/bash
# Round-3 serialized TPU queue, link 7: iterative network refinement
# probe on the 80k flagship — re-apply the model to its own aligned
# output, compose, score raw + trust-gated (scripts/probe_iter_refine.py).
# Also a tighter-gate variant if the default gate accepts too little.
#
# Usage: scripts/round3_chain7.sh [PREV_CHAIN_PID]
set -u
PREV="${1:-}"
cd "$(dirname "$0")/.."
PIDFILE=/tmp/tpu-chain-round3-7.pid
echo $$ > "$PIDFILE"
trap 'rm -f "$PIDFILE"' EXIT

log() { echo "[chain7 $(date '+%H:%M:%S')] $*"; }

if [ -n "$PREV" ]; then
    log "waiting for chain pid=$PREV"
    while kill -0 "$PREV" 2>/dev/null; do sleep 60; done
fi
log "previous chain done"

log "step A: iterative network refinement probe (3 iters, gate 2deg/0.15m)"
timeout -k 30 5400 python scripts/probe_iter_refine.py \
    /root/data/runs/SynthCars80k 209 3 2.0 0.15
log "step A rc=$?"

log "step B: looser gate variant (5deg/0.3m)"
timeout -k 30 5400 python scripts/probe_iter_refine.py \
    /root/data/runs/SynthCars80k 209 2 5.0 0.3
log "step B rc=$?"

log "chain7 complete"
