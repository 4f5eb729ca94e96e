#!/bin/bash
# Round-3 serialized TPU queue, link 17: DGCNN fast-path validation.
# The flat-row-gather fix + fused Pallas kNN kernel (ops/knn_kernels.py)
# attack the two dominant terms of the DGCNN forward measured by
# scripts/bench_dgcnn.py (gather 12.2 ms, top_k 10.5 ms of a 21.5 ms
# forward). Steps: on-chip kernel-vs-XLA microbench + backbone numbers,
# then a 3-epoch training probe for the new s/epoch (chain14 baseline:
# 92 s/epoch exact-knn at 40k/N=512 — the "4.1x premium over PointNet").
# Usage: scripts/round3_chain17.sh [PREV_CHAIN_PID]
set -u
PREV="${1:-}"
cd "$(dirname "$0")/.."
PIDFILE=/tmp/tpu-chain-round3-17.pid
echo $$ > "$PIDFILE"
trap 'rm -f "$PIDFILE"' EXIT
log() { echo "[chain17 $(date '+%H:%M:%S')] $*"; }
if [ -n "$PREV" ]; then
    log "waiting for chain pid=$PREV"
    while kill -0 "$PREV" 2>/dev/null; do sleep 60; done
fi
log "previous chain done"

log "step A: DGCNN efficiency probe (knn variants + backbone fwd/bwd)"
timeout -k 30 2400 python scripts/bench_dgcnn.py 128 512
log "step A rc=$?"

log "step B: 3-epoch DGCNN training probe (new s/epoch vs chain14's 92s)"
python3 - <<'PYEOF'
import json
c = json.load(open('configs/SynthCars40kDGCNN.json'))
c['training']['num_epochs'] = 3
json.dump(c, open('/tmp/DGCNNProbe17.json', 'w'), indent=4)
PYEOF
rm -rf /root/data/runs/DGCNNProbe17
timeout -k 30 3600 python train.py train --config /tmp/DGCNNProbe17.json
log "step B rc=$?"
grep -o "Finished epoch.*" /root/data/runs/DGCNNProbe17/out.log | tail -3
log "chain17 done"
