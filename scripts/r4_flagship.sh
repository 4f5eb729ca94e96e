#!/bin/bash
# Round-4 80k flagship: trains the config the A/B decision picked
# (scripts/r4_ab_analysis.py -> /root/data/r4_ab_decision.json) and
# records the run name for the downstream eval steps.
#
# Deadline-aware (round-3 lesson: the driver's round-end bench kills
# whatever is running): training gets now..(deadline - EVAL_RESERVE) and
# is then cut; train_supervised auto-resumes from the rolling ckpt on a
# replay, and eval_variants evals the latest numbered checkpoint either
# way. The on-chip smoke for this box already ran (queue step smoke_r4w,
# docs/onchip_smoke.json committed 2026-08-19) so no rerun here.
set -eu
cd "$(dirname "$0")/.."

# DGCNN epoch-premium probe first (~25 min, VERDICT r3 item 3): cheap,
# decision-grade, and must not be starved by open-ended training.
if [ ! -f /root/data/markers/dgcnn_probe.done ]; then
    if bash scripts/r4_dgcnn_probe.sh; then
        touch /root/data/markers/dgcnn_probe.done
    else
        echo "[r4_flagship] dgcnn probe failed — continuing to flagship"
    fi
fi

CFG=$(python -c "import json; print(json.load(open('/root/data/r4_ab_decision.json'))['flagship_config'])")
NAME=$(basename "$CFG" .json)
echo "$NAME" > /root/data/r4_flagship.txt

DEADLINE=$(cat /root/data/r4_deadline.txt 2>/dev/null || echo 0)
EVAL_RESERVE=2700
NOW=$(date +%s)
if [ "$DEADLINE" -gt 0 ]; then
    BUDGET=$((DEADLINE - EVAL_RESERVE - NOW))
else
    BUDGET=86400
fi
if [ "$BUDGET" -lt 600 ]; then
    echo "[r4_flagship] no time budget left ($BUDGET s) — skipping training"
    exit 1
fi
echo "[r4_flagship] training $CFG for up to $BUDGET s"
rc=0
timeout -k 60 "$BUDGET" bash scripts/train_supervised.sh "$CFG" 1800 || rc=$?
if [ "$rc" -eq 124 ] || [ "$rc" -eq 137 ]; then
    echo "[r4_flagship] time budget exhausted — flagship incomplete (replay resumes)"
    exit 1
fi
exit $rc
