#!/bin/bash
# Round-5: finish the 80k center-sup flagship (VERDICT r4 item 2 — it
# died at epoch 11/119 at round-4 end; the rolling checkpoint resumes).
# Time-boxed against the r5 deadline minus the eval/Hard reserve.
set -eu
cd "$(dirname "$0")/.."
CFG=configs/SynthCars80kCenterSup.json

DEADLINE=$(cat /root/data/r5_deadline.txt 2>/dev/null || echo 0)
RESERVE=9000    # eval rows for both flagships + Hard rows
NOW=$(date +%s)
if [ "$DEADLINE" -gt 0 ]; then
    BUDGET=$((DEADLINE - RESERVE - NOW))
else
    BUDGET=86400
fi
if [ "$BUDGET" -lt 600 ]; then
    echo "[r5_center80k_resume] no time budget left ($BUDGET s) — skipping"
    exit 1
fi
echo "[r5_center80k_resume] resuming $CFG for up to $BUDGET s"
rc=0
timeout -k 60 "$BUDGET" bash scripts/train_supervised.sh "$CFG" 1800 || rc=$?
if [ "$rc" -eq 124 ] || [ "$rc" -eq 137 ]; then
    echo "[r5_center80k_resume] time budget exhausted — incomplete (replay resumes)"
    exit 1
fi
exit $rc
