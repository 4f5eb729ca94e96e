#!/bin/bash
# Round-3 serialized TPU queue, link 9: bookkeeping + true fresh-data eval.
#  A. p2plane single-stage refine eval (chain5 step A rerun — original hit
#     the hot-edit hazard: imported trainer.py between two edits).
#  B. uniform inputs + CURRENT tight gate (2deg/0.15) p2p refine eval —
#     the 18:47 "headline refine" ran with the stale loose gate (10/0.5)
#     and degraded <20cm; this is the missing clean row.
#  C. genuinely-fresh validation set (seed 777 — 21/22 were the train
#     chunks; the old SynthCarsVal2k turned out to BE the 80k val split
#     by construction) + network-only and cascade-refined evals on it.
#
# Usage: scripts/round3_chain9.sh [PREV_CHAIN_PID]
set -u
PREV="${1:-}"
cd "$(dirname "$0")/.."
PIDFILE=/tmp/tpu-chain-round3-9.pid
echo $$ > "$PIDFILE"
trap 'rm -f "$PIDFILE"' EXIT

log() { echo "[chain9 $(date '+%H:%M:%S')] $*"; }

if [ -n "$PREV" ]; then
    log "waiting for chain pid=$PREV"
    while kill -0 "$PREV" 2>/dev/null; do sleep 60; done
fi
log "previous chain done"

log "step A: p2plane single-stage refine eval (rerun)"
timeout -k 30 7200 python train.py eval_only \
    --config configs/SynthCars80k.json --refineICP \
    --refineICPmethod p2plane --eval_epoch 209
log "step A rc=$?"

log "step B: uniform inputs + tight gate p2p refine (clean row)"
timeout -k 30 7200 python scripts/eval_with_config.py \
    configs/SynthCars80k.json 209 /root/data/runs/SynthCars80k --refineICP
log "step B rc=$?"

log "step C1: generate SynthCarsValFresh (2000 scenes, seed 777)"
timeout -k 30 3600 python - <<'PYEOF'
from alignnet3d_tpu.data.synthetic import generate_dataset
import time
t0 = time.time()
generate_dataset('/root/data/SynthCarsValFresh', 0, 2000, seed=777)
print('fresh val generated in', time.time() - t0)
PYEOF
log "step C1 rc=$?"

log "step C2: fresh-data evals (net, then cascade p2p->p2plane)"
python3 - <<'PYEOF'
import json
c = json.load(open('configs/SynthCars80k.json'))
c['data']['basepath'] = '/root/data/SynthCarsValFresh'
json.dump(c, open('/tmp/SynthCars80kFresh2.json', 'w'), indent=4)
c2 = json.load(open('configs/SynthCars80kCascade.json'))
c2['data']['basepath'] = '/root/data/SynthCarsValFresh'
json.dump(c2, open('/tmp/SynthCars80kFresh2Cascade.json', 'w'), indent=4)
PYEOF
timeout -k 30 3600 python scripts/eval_with_config.py \
    /tmp/SynthCars80kFresh2.json 209 /root/data/runs/SynthCars80k
log "step C2-net rc=$?"
timeout -k 30 7200 python scripts/eval_with_config.py \
    /tmp/SynthCars80kFresh2Cascade.json 209 /root/data/runs/SynthCars80k --refineICP
log "step C2-cascade rc=$?"

log "chain9 complete"
