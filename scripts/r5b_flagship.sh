#!/bin/bash
# Round-5 final-session flagship: SynthCars80kCenterSupScratch — the 80k
# center-supervision arm (VERDICT r4 item 2) trained FROM SCRATCH because
# the box wipe took every checkpoint including the 40k warm-start arm
# (round-3 precedent: from-scratch 80k reached 88.2% <20cm by epoch 143).
# Deadline-aware: reserves the post-flagship TPU window for the eval rows
# (r5b_eval.sh), Hard rows (r5b_hard.sh) and the DGCNN/radius probe
# (r5b_probe.sh). Exits rc=1 when time-boxed so a queue replay resumes
# from the rolling checkpoint; r5b_eval.sh also finishes a short run.
set -u
cd "$(dirname "$0")/.."

# never overlap the standalone smoke client (one TPU client at a time)
if [ -f /tmp/smoke.pid ]; then
    while kill -0 "$(cat /tmp/smoke.pid)" 2>/dev/null; do sleep 20; done
fi

N=SynthCars80kCenterSupScratch
DEADLINE=$(cat /root/data/r5_deadline.txt 2>/dev/null || echo 0)
RESERVE=7800   # eval rows ~3600 + Hard rows ~2700 + probe ~1500
if [ "$DEADLINE" -gt 0 ]; then
    BUDGET=$((DEADLINE - RESERVE - $(date +%s)))
else
    BUDGET=86400
fi
if [ "$BUDGET" -lt 900 ]; then
    echo "[r5b_flagship] only ${BUDGET}s budget — skipping"
    exit 1
fi
echo "[r5b_flagship] training $N with ${BUDGET}s box"
timeout -k 60 "$BUDGET" bash scripts/train_supervised.sh "configs/$N.json" 1800
rc=$?
E=$(ls "/root/data/runs/$N" 2>/dev/null | sed -n 's/^model-\([0-9]*\)\.msgpack$/\1/p' | sort -n | tail -1)
echo "[r5b_flagship] rc=$rc latest epoch ${E:-none}"
WANT=$(python -c "import json; print(json.load(open('configs/$N.json'))['training']['num_epochs'] - 1)")
if [ -n "$E" ] && [ "$E" -ge "$WANT" ]; then
    exit 0
fi
exit 1
