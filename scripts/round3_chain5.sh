#!/bin/bash
# Round-3 p2plane queue: runs after round3_chain4.sh completes.
# Evaluates the new constrained point-to-plane refinement
# (icp/p2plane.py — the reference's asserted-out variant) on the 80k
# headline model, targeting the <2 cm bucket:
#   A. p2plane refine, shipped gate (head-to-head vs p2p's 9.2/62.8/88.1)
#   B. cascade p2p(r=0.1) -> p2plane(r=0.05) fine-polish stage
# Usage: scripts/round3_chain5.sh [CHAIN4_PID]
set -u
PREV_PID="${1:-}"
cd "$(dirname "$0")/.."
PIDFILE=/tmp/tpu-chain-round3e.pid
echo $$ > "$PIDFILE"
trap 'rm -f "$PIDFILE"' EXIT

log() { echo "[chain5 $(date '+%H:%M:%S')] $*"; }

if [ -n "$PREV_PID" ]; then
    log "waiting for chain4 pid=$PREV_PID"
    while kill -0 "$PREV_PID" 2>/dev/null; do sleep 60; done
fi
log "chain4 done"

log "step A: p2plane refine eval on 80k model-209 (shipped gate)"
timeout -k 30 7200 python train.py eval_only \
    --config configs/SynthCars80k.json --refineICP \
    --refineICPmethod p2plane --eval_epoch 209
log "step A rc=$?"

log "step B: cascade p2p(0.1) -> p2plane(0.05) on 80k model-209"
python3 - <<'PYEOF'
import json
c = json.load(open('configs/SynthCars80k.json'))
c['evaluation']['refinement'] = {
    "cascade": [
        {"radius": 0.1, "method": "p2p"},
        {"radius": 0.05, "method": "p2plane", "its": 20,
         "max_dyaw_deg": 1.0, "max_dxy": 0.05},
    ]
}
json.dump(c, open('/tmp/SynthCars80kP2PlaneCascade.json', 'w'), indent=4)
PYEOF
timeout -k 30 7200 python scripts/eval_with_config.py \
    /tmp/SynthCars80kP2PlaneCascade.json 209 /root/data/runs/SynthCars80k \
    --refineICP
log "step B rc=$?"

log "chain5 complete"
