#!/bin/bash
# Round-3 serialized TPU queue, link 15: deeper network refinement on
# the shipped stack — the residual refiner is iteration-stable (chain8:
# 90.0% <20cm at 3 raw passes), and trainer-side iterations compose
# from the GATED chain (frame-consistent). Variants on 80k model-209:
#   A. voxel + net-refine(refiner weights, iterations=2) + p2plane
#   B. same with iterations=3
# Usage: scripts/round3_chain15.sh [PREV_CHAIN_PID]
set -u
PREV="${1:-}"
cd "$(dirname "$0")/.."
PIDFILE=/tmp/tpu-chain-round3-15.pid
echo $$ > "$PIDFILE"
trap 'rm -f "$PIDFILE"' EXIT
log() { echo "[chain15 $(date '+%H:%M:%S')] $*"; }
if [ -n "$PREV" ]; then
    log "waiting for chain pid=$PREV"
    while kill -0 "$PREV" 2>/dev/null; do sleep 60; done
fi
log "previous chain done"

for its in 2 3; do
    log "step: voxel + refinerW net-refine x$its + p2plane single"
    python3 - "$its" <<'PYEOF'
import json, sys
its = int(sys.argv[1])
c = json.load(open('configs/SynthCars80kFullStack.json'))
c['evaluation']['refinement'] = {"method": "p2plane", "radius": 0.1}
c['evaluation']['network_refine']['weights'] = \
    '/root/data/runs/SynthCars80kRefiner/model-59'
c['evaluation']['network_refine']['iterations'] = its
json.dump(c, open(f'/tmp/FS_iter{its}.json', 'w'), indent=4)
PYEOF
    timeout -k 30 7200 python scripts/eval_with_config.py \
        /tmp/FS_iter$its.json 209 /root/data/runs/SynthCars80k --refineICP
    log "iterations=$its rc=$?"
done
log "chain15 complete"
