#!/bin/bash
# Round-3 serialized TPU queue, link 11: the EVERYTHING stack —
# voxel-equalized inputs + two-pass network refinement + gated
# p2p->p2plane ICP cascade on the 80k flagship (each lever individually
# validated; this measures the combination), plus the refiner-weights
# variant if chain8 produced one.
#
# Usage: scripts/round3_chain11.sh [PREV_CHAIN_PID]
set -u
PREV="${1:-}"
cd "$(dirname "$0")/.."
PIDFILE=/tmp/tpu-chain-round3-11.pid
echo $$ > "$PIDFILE"
trap 'rm -f "$PIDFILE"' EXIT

log() { echo "[chain11 $(date '+%H:%M:%S')] $*"; }

if [ -n "$PREV" ]; then
    log "waiting for chain pid=$PREV"
    while kill -0 "$PREV" 2>/dev/null; do sleep 60; done
fi
log "previous chain done"

log "step A: voxel + network_refine + cascade p2p->p2plane"
timeout -k 30 7200 python scripts/eval_with_config.py \
    configs/SynthCars80kFullStack.json 209 /root/data/runs/SynthCars80k --refineICP
log "step A rc=$?"

if [ -f /root/data/runs/SynthCars80kRefiner/model-59.msgpack ]; then
    log "step B: same + refiner weights for pass 2"
    python3 - <<'PYEOF'
import json
c = json.load(open('configs/SynthCars80kFullStack.json'))
c['evaluation']['network_refine']['weights'] = \
    '/root/data/runs/SynthCars80kRefiner/model-59'
json.dump(c, open('/tmp/SynthCars80kFullStackRW.json', 'w'), indent=4)
PYEOF
    timeout -k 30 7200 python scripts/eval_with_config.py \
        /tmp/SynthCars80kFullStackRW.json 209 /root/data/runs/SynthCars80k --refineICP
    log "step B rc=$?"
fi

log "chain11 complete"
