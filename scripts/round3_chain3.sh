#!/bin/bash
# Round-3 finalization queue: fresh-data generalization eval.
# SynthCarsVal2k (2,000 pairs, independent generation seed, never used
# for training or any tuning decision) scores the headline model on
# truly unseen data: any val-split leakage or tuning bias shows up as a
# gap vs the in-run val numbers.
# Usage: scripts/round3_chain3.sh [CHAIN2_PID]
set -u
PREV_PID="${1:-}"
cd "$(dirname "$0")/.."
PIDFILE=/tmp/tpu-chain-round3c.pid
echo $$ > "$PIDFILE"
trap 'rm -f "$PIDFILE"' EXIT

log() { echo "[chain3 $(date '+%H:%M:%S')] $*"; }

if [ -n "$PREV_PID" ]; then
    log "waiting for chain2 pid=$PREV_PID"
    while kill -0 "$PREV_PID" 2>/dev/null; do sleep 60; done
fi
log "chain2 done"

log "fresh-data eval: model-209 on SynthCarsVal2k (net + gated refine)"
python3 - <<'PYEOF'
import json
c = json.load(open('configs/SynthCars80k.json'))
c['data']['basepath'] = '/root/data/SynthCarsVal2k'
json.dump(c, open('/tmp/SynthCars80kFresh.json', 'w'), indent=4)
PYEOF
timeout -k 30 3600 python scripts/eval_with_config.py \
    /tmp/SynthCars80kFresh.json 209 /root/data/runs/SynthCars80k
log "net rc=$?"
timeout -k 30 7200 python scripts/eval_with_config.py \
    /tmp/SynthCars80kFresh.json 209 /root/data/runs/SynthCars80k --refineICP
log "refined rc=$?"
log "chain3 complete"
