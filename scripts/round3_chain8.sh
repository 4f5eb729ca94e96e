#!/bin/bash
# Round-3 serialized TPU queue, link 8: learned fine-aligner.
# Train the residual-task refiner (configs/SynthCars80kRefiner.json,
# fine-tune of 80k model-209 on the near-identity residual distribution,
# data/residual.py), then measure end-to-end two-stage accuracy with
# scripts/probe_iter_refine.py --refiner (coarse pass -> compose refiner
# pass, raw + trust-gated).
#
# Usage: scripts/round3_chain8.sh [PREV_CHAIN_PID]
set -u
PREV="${1:-}"
cd "$(dirname "$0")/.."
PIDFILE=/tmp/tpu-chain-round3-8.pid
echo $$ > "$PIDFILE"
trap 'rm -f "$PIDFILE"' EXIT

log() { echo "[chain8 $(date '+%H:%M:%S')] $*"; }

if [ -n "$PREV" ]; then
    log "waiting for chain pid=$PREV"
    while kill -0 "$PREV" 2>/dev/null; do sleep 60; done
fi
log "previous chain done"

log "step A: train residual-task refiner (60 epochs from 80k model-209)"
bash scripts/train_supervised.sh configs/SynthCars80kRefiner.json 1800
log "step A rc=$?"

log "step B: two-stage probe — coarse 80k + refiner, 2 iters, gate 2deg/0.15m"
timeout -k 30 5400 python scripts/probe_iter_refine.py \
    /root/data/runs/SynthCars80k 209 2 2.0 0.15 \
    --refiner /root/data/runs/SynthCars80kRefiner 59
log "step B rc=$?"

log "step C: looser gate (10deg/0.5m) — refiner was trained on that outlier tail"
timeout -k 30 5400 python scripts/probe_iter_refine.py \
    /root/data/runs/SynthCars80k 209 3 10.0 0.5 \
    --refiner /root/data/runs/SynthCars80kRefiner 59
log "step C rc=$?"

log "chain8 complete"
