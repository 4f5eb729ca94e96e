#!/bin/bash
# Adopt-and-watch flagship supervision (round-5 final session).
#
# The 1800s kill+resume cycling (train_supervised.sh) is counter-
# productive on boxes where each fresh TPU client pays a 10-20 min
# first-dispatch stall: the 22:47 cycle of the 80k flagship spent its
# ENTIRE 30-min window in stall+compile and trained zero epochs. This
# box has 116 GB free, so the tunnel-client leak (~1-2 GB/epoch) fits a
# single long-lived process for ~50+ epochs; the watcher therefore
#   1. waits on the adopted trainer pid (/tmp/flagship_train.pid),
#   2. enforces the deadline-minus-reserve timebox by killing that pid
#      (exact pid, never pattern) when the eval window must open,
#   3. resumes with an effectively-infinite cycle if the trainer dies
#      early (OOM kill -> rolling-ckpt auto-resume, one stall each).
set -u
cd "$(dirname "$0")/.."

N=SynthCars80kCenterSupScratch
RESERVE=7800
DEADLINE=$(cat /root/data/r5_deadline.txt 2>/dev/null || echo 0)
cutoff() {
    if [ "$DEADLINE" -gt 0 ]; then echo $((DEADLINE - RESERVE)); else echo $(( $(date +%s) + 86400 )); fi
}
WANT=$(python -c "import json; print(json.load(open('configs/$N.json'))['training']['num_epochs'] - 1)")

latest() {
    ls "/root/data/runs/$N" 2>/dev/null | sed -n 's/^model-\([0-9]*\)\.msgpack$/\1/p' | sort -n | tail -1
}

PID=$(cat /tmp/flagship_train.pid 2>/dev/null || echo 0)
while true; do
    if [ "$PID" -gt 0 ] && kill -0 "$PID" 2>/dev/null; then
        if [ "$(date +%s)" -ge "$(cutoff)" ]; then
            echo "[r5b_watch] timebox reached — stopping trainer pid $PID"
            kill "$PID" 2>/dev/null
            for _ in $(seq 1 12); do kill -0 "$PID" 2>/dev/null || break; sleep 5; done
            kill -9 "$PID" 2>/dev/null
            break
        fi
        sleep 30
        continue
    fi
    # trainer not running: done, crashed, or never adopted
    E=$(latest)
    if [ -n "$E" ] && [ "$E" -ge "$WANT" ]; then break; fi
    BUDGET=$(( $(cutoff) - $(date +%s) ))
    if [ "$BUDGET" -lt 900 ]; then
        echo "[r5b_watch] trainer down at epoch ${E:-none}, ${BUDGET}s left — stopping"
        break
    fi
    echo "[r5b_watch] trainer down at epoch ${E:-none} — resuming (${BUDGET}s box, no cycling)"
    timeout -k 60 "$BUDGET" bash scripts/train_supervised.sh "configs/$N.json" 86400
    PID=0
done

E=$(latest)
echo "[r5b_watch] final epoch ${E:-none} (target $WANT)"
[ -n "$E" ] && [ "$E" -ge "$WANT" ] && exit 0
exit 1
