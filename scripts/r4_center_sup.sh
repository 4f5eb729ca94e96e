#!/bin/bash
# Round-4 <2cm lever probe (round-5 queue item 3): canonical-frame center
# supervision arm at 40k/60ep, A/B'd against the already-trained base arm
# (SynthCars40kBaseR4, same box/epochs/data — r4_ab_analysis.py metrics).
set -eu
cd "$(dirname "$0")/.."
CFG=configs/SynthCars40kCenterSupR4.json
if [ ! -f "$CFG" ]; then
    echo "[r4_center_sup] $CFG not present yet — retry on replay"
    exit 1
fi

DEADLINE=$(cat /root/data/r4_deadline.txt 2>/dev/null || echo 0)
NOW=$(date +%s)
RESERVE=600    # analysis + margin
if [ "$DEADLINE" -gt 0 ]; then
    BUDGET=$((DEADLINE - RESERVE - NOW))
else
    BUDGET=86400
fi
if [ "$BUDGET" -lt 900 ]; then
    echo "[r4_center_sup] no time budget ($BUDGET s) — skipping"
    exit 1
fi
echo "[r4_center_sup] training for up to $BUDGET s"
rc=0
timeout -k 60 "$BUDGET" bash scripts/train_supervised.sh "$CFG" 1800 || rc=$?

python scripts/r4_ab_analysis.py --arm center=SynthCars40kCenterSupR4 \
    --out /root/data/r4_center_decision.json || true
if [ "$rc" -eq 124 ] || [ "$rc" -eq 137 ]; then
    echo "[r4_center_sup] time-boxed out — interim analysis above"
    exit 1
fi
exit $rc
