#!/bin/bash
# Long-run training supervisor (round-3 operational tool).
#
# The dev box's TPU tunnel client leaks host memory (~130 GB RSS by ~36k
# dispatches, CLAUDE.md gotchas); long runs are therefore executed as a
# kill+auto-resume loop: each cycle trains for CYCLE_SECONDS, is killed,
# and the next cycle resumes from the rolling model.ckpt
# (training/trainer.py:823-828). Exits when training completes (rc=0) or
# fails for a non-timeout reason (e.g. the NaN guard).
#
# Usage: scripts/train_supervised.sh CONFIG [CYCLE_SECONDS]
set -u
CONFIG="$1"
CYCLE="${2:-1800}"
cd "$(dirname "$0")/.."
# register as a stoppable TPU chain root (bench.py serialization guard);
# deregister on exit so stale pidfiles can't point at recycled pids
PIDFILE="/tmp/tpu-chain-sup-$(basename "$CONFIG" .json).pid"
echo $$ > "$PIDFILE"
# Round-4 incident: an outer `timeout` TERM'd this supervisor but the
# inner python survived it (bash does not forward signals to a foreground
# child), leaving TWO TPU clients dispatching concurrently — the exact
# tunnel-wedge hazard. Run the cycle in the background and forward
# TERM/INT to it before exiting.
CHILD=
on_term() {
    [ -n "$CHILD" ] && kill "$CHILD" 2>/dev/null
    rm -f "$PIDFILE"
    exit 143
}
trap on_term TERM INT
trap 'rm -f "$PIDFILE"' EXIT
while true; do
    timeout -k 30 "$CYCLE" python train.py train --config "$CONFIG" &
    CHILD=$!
    wait "$CHILD"
    rc=$?
    CHILD=
    if [ "$rc" -eq 0 ]; then
        echo "[supervisor] training completed"
        break
    elif [ "$rc" -eq 124 ] || [ "$rc" -eq 137 ]; then
        echo "[supervisor] cycle timeout (rc=$rc) — restarting from rolling ckpt"
        sleep 5
    else
        echo "[supervisor] training failed rc=$rc — stopping"
        break
    fi
done
