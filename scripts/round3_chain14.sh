#!/bin/bash
# Round-3 serialized TPU queue, link 14: DGCNN graph-build cost A/B —
# exact lax.top_k vs TPU-native lax.approx_max_k
# (model.options.dgcnn_approx_knn), 3 training epochs each on the 40k
# dataset. The DGCNN backbone costs 4.1x PointNet per epoch; the
# hypothesis is the exact sort-based top-k dominates.
# Usage: scripts/round3_chain14.sh [PREV_CHAIN_PID]
set -u
PREV="${1:-}"
cd "$(dirname "$0")/.."
PIDFILE=/tmp/tpu-chain-round3-14.pid
echo $$ > "$PIDFILE"
trap 'rm -f "$PIDFILE"' EXIT
log() { echo "[chain14 $(date '+%H:%M:%S')] $*"; }
if [ -n "$PREV" ]; then
    log "waiting for chain pid=$PREV"
    while kill -0 "$PREV" 2>/dev/null; do sleep 60; done
fi
log "previous chain done"

for variant in exact approx; do
    log "step: dgcnn 3-epoch probe ($variant knn)"
    # throwaway probe runs: clear any previous attempt so out.log is
    # fresh (setup_logging rolls an existing out.log to out_<date>.log,
    # which would make the result grep read a STALE run — review finding)
    rm -rf "/root/data/runs/DGCNNKnn_${variant}"
    python3 - "$variant" <<'PYEOF'
import json, sys
v = sys.argv[1]
c = json.load(open('configs/SynthCars40kDGCNN.json'))
c['training']['num_epochs'] = 3
if v == 'approx':
    c['model']['options']['dgcnn_approx_knn'] = True
json.dump(c, open(f'/tmp/DGCNNKnn_{v}.json', 'w'), indent=4)
PYEOF
    timeout -k 30 3600 python train.py train --config /tmp/DGCNNKnn_$variant.json
    rc=$?
    log "variant $variant rc=$rc"
    [ $rc -ne 0 ] && log "variant $variant DID NOT FINISH — comparison invalid"
done
grep "Finished epoch" /root/data/runs/DGCNNKnn_exact/out.log | tail -2
grep "Finished epoch" /root/data/runs/DGCNNKnn_approx/out.log | tail -2
log "chain14 complete"
