#!/bin/bash
# Round-3 serialized TPU queue, link 13: from-scratch voxel-input
# flagship. The 40-epoch fine-tune never escaped the uniform-input
# basin (RESULTS "the input switch is load-bearing, the weights are
# not"); this tests whether 210 epochs FROM SCRATCH on density-
# equalized inputs sharpens per-view centers (the identified accuracy
# floor). Then: network-only eval + the full stack on the winner epoch.
# Usage: scripts/round3_chain13.sh [PREV_CHAIN_PID]
set -u
PREV="${1:-}"
cd "$(dirname "$0")/.."
PIDFILE=/tmp/tpu-chain-round3-13.pid
echo $$ > "$PIDFILE"
trap 'rm -f "$PIDFILE"' EXIT
log() { echo "[chain13 $(date '+%H:%M:%S')] $*"; }
if [ -n "$PREV" ]; then
    log "waiting for chain pid=$PREV"
    while kill -0 "$PREV" 2>/dev/null; do sleep 60; done
fi
log "previous chain done"

log "step A: train SynthCars80kVoxScratch (210 epochs from scratch)"
bash scripts/train_supervised.sh configs/SynthCars80kVoxScratch.json 1800
log "step A rc=$?"

log "step B: full stack on the scratch model (net2 + p2plane, voxel native)"
python3 - <<'PYEOF'
import json
c = json.load(open('configs/SynthCars80kFullStack.json'))
# same stack, but weights come from the voxel-native run
json.dump(c, open('/tmp/VoxScratchStack.json', 'w'), indent=4)
PYEOF
timeout -k 30 7200 python scripts/eval_with_config.py \
    /tmp/VoxScratchStack.json 209 /root/data/runs/SynthCars80kVoxScratch --refineICP
log "step B rc=$?"

log "chain13 complete"
