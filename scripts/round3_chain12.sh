#!/bin/bash
# Round-3 serialized TPU queue, link 12 (final combos): the cascade lost
# to SINGLE p2plane in the pure-ICP ladder, so test the winning stacks
# with p2plane-single as the geometric stage, then the best stack on the
# genuinely-fresh seed-777 set for the headline generalization row.
# Usage: scripts/round3_chain12.sh [PREV_CHAIN_PID]
set -u
PREV="${1:-}"
cd "$(dirname "$0")/.."
PIDFILE=/tmp/tpu-chain-round3-12.pid
echo $$ > "$PIDFILE"
trap 'rm -f "$PIDFILE"' EXIT
log() { echo "[chain12 $(date '+%H:%M:%S')] $*"; }
if [ -n "$PREV" ]; then
    log "waiting for chain pid=$PREV"
    while kill -0 "$PREV" 2>/dev/null; do sleep 60; done
fi
log "previous chain done"

# inline config generation (review finding: the original run consumed
# session-local /tmp configs no committed code creates — a rerun on a
# fresh box would fail on missing files)
python3 - <<'PYEOF'
import json
c = json.load(open('configs/SynthCars80kFullStack.json'))
c['evaluation']['refinement'] = {"method": "p2plane", "radius": 0.1}
json.dump(c, open('/tmp/FS_p2plane.json', 'w'), indent=4)
c['evaluation']['network_refine']['weights'] = \
    '/root/data/runs/SynthCars80kRefiner/model-59'
json.dump(c, open('/tmp/FS_p2plane_rw.json', 'w'), indent=4)
PYEOF

log "step A: voxel + net2(base) + p2plane single"
timeout -k 30 7200 python scripts/eval_with_config.py \
    /tmp/FS_p2plane.json 209 /root/data/runs/SynthCars80k --refineICP
log "step A rc=$?"

log "step B: voxel + net2(refinerW) + p2plane single"
timeout -k 30 7200 python scripts/eval_with_config.py \
    /tmp/FS_p2plane_rw.json 209 /root/data/runs/SynthCars80k --refineICP
log "step B rc=$?"

log "step C: best stack on the FRESH seed-777 set"
python3 - <<'PYEOF'
import json
c = json.load(open('/tmp/FS_p2plane.json'))
c['data']['basepath'] = '/root/data/SynthCarsValFresh'
json.dump(c, open('/tmp/FS_p2plane_fresh.json', 'w'), indent=4)
PYEOF
timeout -k 30 7200 python scripts/eval_with_config.py \
    /tmp/FS_p2plane_fresh.json 209 /root/data/runs/SynthCars80k --refineICP
log "step C rc=$?"

log "chain12 complete"
