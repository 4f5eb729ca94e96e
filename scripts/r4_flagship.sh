#!/bin/bash
# Round-4 80k flagship: trains the config the A/B decision picked
# (scripts/r4_ab_analysis.py -> /root/data/r4_ab_decision.json) and
# records the run name for the downstream eval steps.
set -eu
cd "$(dirname "$0")/.."
# on-chip kernel smoke FIRST (~10 min): the 14:59 run predated the
# HIGHEST-precision fix (nn_argmin) and the metric redesign; this rerun
# is the round's committed kernel-validation artifact. Non-fatal to the
# flagship if it fails — but the JSON records it either way.
timeout 1800 python scripts/onchip_smoke.py || echo "[r4_flagship] smoke FAILED (see docs/onchip_smoke.json)"
CFG=$(python -c "import json; print(json.load(open('/root/data/r4_ab_decision.json'))['flagship_config'])")
NAME=$(basename "$CFG" .json)
echo "$NAME" > /root/data/r4_flagship.txt
echo "[r4_flagship] training $CFG"
bash scripts/train_supervised.sh "$CFG" 1800
