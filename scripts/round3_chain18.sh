#!/bin/bash
# Round-3 serialized TPU queue, link 18: int8 serving quantization —
# accuracy deltas per scope on the fresh base-arm checkpoint + pairs/s
# at the bench batch. Decides whether ops/quant.py is adoptable for the
# headline bench (docs/RESULTS.md).
# Usage: scripts/round3_chain18.sh [PREV_CHAIN_PID]
set -u
PREV="${1:-}"
cd "$(dirname "$0")/.."
PIDFILE=/tmp/tpu-chain-round3-18.pid
echo $$ > "$PIDFILE"
trap 'rm -f "$PIDFILE"' EXIT
log() { echo "[chain18 $(date '+%H:%M:%S')] $*"; }
if [ -n "$PREV" ]; then
    log "waiting for chain pid=$PREV"
    while kill -0 "$PREV" 2>/dev/null; do sleep 60; done
fi
log "previous chain done"

log "step A: quantized serving accuracy + throughput (base arm, epoch 119)"
timeout -k 30 3600 python scripts/eval_quant.py \
    configs/SynthCars40kBase.json 119 8192
log "step A rc=$?"
log "chain18 done"
