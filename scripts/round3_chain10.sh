#!/bin/bash
# Round-3 serialized TPU queue, link 10: the full refinement stack on
# the 80k flagship — two-pass network refinement (evaluation.
# network_refine, measured strictly better: 8.7/65.0/89.3 in the chain7
# probe) alone, + cascade p2p->p2plane ICP on top, and with the
# residual-task refiner's weights for the second pass (chain8 training).
#
# Usage: scripts/round3_chain10.sh [PREV_CHAIN_PID]
set -u
PREV="${1:-}"
cd "$(dirname "$0")/.."
PIDFILE=/tmp/tpu-chain-round3-10.pid
echo $$ > "$PIDFILE"
trap 'rm -f "$PIDFILE"' EXIT

log() { echo "[chain10 $(date '+%H:%M:%S')] $*"; }

if [ -n "$PREV" ]; then
    log "waiting for chain pid=$PREV"
    while kill -0 "$PREV" 2>/dev/null; do sleep 60; done
fi
log "previous chain done"

log "step A: network_refine eval (standard artifacts, no ICP)"
timeout -k 30 7200 python scripts/eval_with_config.py \
    configs/SynthCars80kNetRefine.json 209 /root/data/runs/SynthCars80k
log "step A rc=$?"

log "step B: network_refine + cascade p2p->p2plane"
timeout -k 30 7200 python scripts/eval_with_config.py \
    configs/SynthCars80kNetRefineCascade.json 209 /root/data/runs/SynthCars80k --refineICP
log "step B rc=$?"

if [ -f /root/data/runs/SynthCars80kRefiner/model-59.msgpack ]; then
    log "step C: network_refine with RESIDUAL-REFINER weights + cascade"
    python3 - <<'PYEOF'
import json
c = json.load(open('configs/SynthCars80kNetRefineCascade.json'))
c['evaluation']['network_refine']['weights'] = \
    '/root/data/runs/SynthCars80kRefiner/model-59'
json.dump(c, open('/tmp/SynthCars80kNetRefinerW.json', 'w'), indent=4)
PYEOF
    timeout -k 30 7200 python scripts/eval_with_config.py \
        /tmp/SynthCars80kNetRefinerW.json 209 /root/data/runs/SynthCars80k --refineICP
    log "step C rc=$?"
else
    log "step C skipped: no refiner checkpoint"
fi

log "chain10 complete"
