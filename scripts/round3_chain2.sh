#!/bin/bash
# Round-3 follow-up TPU queue: runs after round3_chain.sh completes.
# Evals that reuse the trained 80k weights with config variants:
#   A. base weights + voxel inputs + re-tuned gated refine (the two best
#      levers combined; the pretr control showed vox inputs alone are
#      worth +2pts <10cm, and the tightened gate +2.7pts <2cm)
#   B. base weights + coarse->fine refinement cascade
# Usage: scripts/round3_chain2.sh [CHAIN_PID]
set -u
CHAIN_PID="${1:-}"
cd "$(dirname "$0")/.."
PIDFILE=/tmp/tpu-chain-round3b.pid
echo $$ > "$PIDFILE"
trap 'rm -f "$PIDFILE"' EXIT

log() { echo "[chain2 $(date '+%H:%M:%S')] $*"; }

if [ -n "$CHAIN_PID" ]; then
    log "waiting for chain pid=$CHAIN_PID"
    while kill -0 "$CHAIN_PID" 2>/dev/null; do sleep 60; done
fi
log "main chain done"

log "step A: base weights + voxel inputs + gated refine"
python3 - <<'PYEOF'
import json
c = json.load(open('configs/SynthCars80k.json'))
c['data']['resample'] = {"mode": "voxel", "voxel_size": 0.05}
json.dump(c, open('/tmp/SynthCars80kVoxEval.json', 'w'), indent=4)
PYEOF
timeout -k 30 7200 python scripts/eval_with_config.py \
    /tmp/SynthCars80kVoxEval.json 209 /root/data/runs/SynthCars80k --refineICP
log "step A rc=$?"
d=/root/data/runs/SynthCars80kVoxEval/val/eval000209
[ -d "$d/refined_p2p" ] && timeout 600 python scripts/tune_gate_posthoc.py \
    /root/data/SynthCars80k "$d" | tail -6

log "step B: coarse->fine cascade on base weights"
timeout -k 30 7200 python scripts/eval_with_config.py \
    configs/SynthCars80kCascade.json 209 /root/data/runs/SynthCars80k --refineICP
log "step B rc=$?"

log "chain2 complete"
