#!/bin/bash
# Round-4 second flagship: 80k center-supervision run. The 40k A/B
# (scripts/r4_center_sup.sh, /root/data/r4_center_decision.json) showed
# the canonical-frame center-consistency loss wins decisively at 40k/60ep
# (per-view center p50 14.08 -> 11.8 cm, eval_180 <2/10/20cm
# 1.5/31.1/65.2 -> 2.5/38.9/76.25), so it gets the 80k slot: warm start
# from the winning 40k arm, 120ep, deadline-aware like r4_flagship.sh
# (training auto-resumes from the rolling ckpt on a replay; the eval step
# evals the latest numbered checkpoint either way).
set -eu
cd "$(dirname "$0")/.."
CFG=configs/SynthCars80kCenterSup.json

DEADLINE=$(cat /root/data/r4_deadline.txt 2>/dev/null || echo 0)
EVAL_RESERVE=2100   # headline + fresh rows for r4_center_eval.sh
NOW=$(date +%s)
if [ "$DEADLINE" -gt 0 ]; then
    BUDGET=$((DEADLINE - EVAL_RESERVE - NOW))
else
    BUDGET=86400
fi
if [ "$BUDGET" -lt 600 ]; then
    echo "[r4_center_flagship] no time budget left ($BUDGET s) — skipping"
    exit 1
fi
echo "[r4_center_flagship] training $CFG for up to $BUDGET s"
rc=0
timeout -k 60 "$BUDGET" bash scripts/train_supervised.sh "$CFG" 1800 || rc=$?
if [ "$rc" -eq 124 ] || [ "$rc" -eq 137 ]; then
    echo "[r4_center_flagship] time budget exhausted — incomplete (replay resumes)"
    exit 1
fi
exit $rc
