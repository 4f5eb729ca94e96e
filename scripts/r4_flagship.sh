#!/bin/bash
# Round-4 80k flagship: trains the config the A/B decision picked
# (scripts/r4_ab_analysis.py -> /root/data/r4_ab_decision.json) and
# records the run name for the downstream eval steps.
set -eu
cd "$(dirname "$0")/.."
CFG=$(python -c "import json; print(json.load(open('/root/data/r4_ab_decision.json'))['flagship_config'])")
NAME=$(basename "$CFG" .json)
echo "$NAME" > /root/data/r4_flagship.txt
echo "[r4_flagship] training $CFG"
bash scripts/train_supervised.sh "$CFG" 1800
