#!/bin/bash
# Round-5 flagship: 160k center-supervision run (VERDICT r4 item 3 — the
# scale curve 8k->42.8, 20k->73.0, 40k->79.1, 80k->88.4 <20cm says dataset
# scale is the most reliable points-per-TPU-hour; the 40k A/B picked the
# canonical-frame center-consistency loss, r4_center_decision.json).
# Warm-starts from the finished round-4 80k flagship (model-119).
# Deadline-aware like r4_flagship.sh: time-boxes training so the rest of
# the round-5 queue (80k center-sup resume + eval rows + Hard rows) keeps
# its slot; exits rc=1 when incomplete so a queue replay resumes from the
# rolling checkpoint.
set -eu
cd "$(dirname "$0")/.."
CFG=configs/SynthCars160kCenterSup.json

DEADLINE=$(cat /root/data/r5_deadline.txt 2>/dev/null || echo 0)
RESERVE=16200   # 80k resume (~2h) + eval rows + Hard rows (~2.5h)
NOW=$(date +%s)
if [ "$DEADLINE" -gt 0 ]; then
    BUDGET=$((DEADLINE - RESERVE - NOW))
else
    BUDGET=86400
fi
if [ "$BUDGET" -lt 600 ]; then
    echo "[r5_flagship160k] no time budget left ($BUDGET s) — skipping"
    exit 1
fi
echo "[r5_flagship160k] training $CFG for up to $BUDGET s"
rc=0
timeout -k 60 "$BUDGET" bash scripts/train_supervised.sh "$CFG" 1800 || rc=$?
if [ "$rc" -eq 124 ] || [ "$rc" -eq 137 ]; then
    echo "[r5_flagship160k] time budget exhausted — incomplete (replay resumes)"
    exit 1
fi
exit $rc
