#!/bin/bash
# Round-4: retrain the residual-task refiner against the round-4 flagship
# so configs/SynthCars80kMax20cm.json is reproducible again (its round-3
# weights path died with the box wipe; round-5 queue item 4).
#
# The repo config warm-starts from the dead /root/data/runs/SynthCars80k/
# model-209; this script writes a same-BASENAME copy to /root/data with
# pretraining pointed at the latest flagship checkpoint (same basename ->
# same derived run name -> Max20cm's weights path stays valid).
# Deadline-aware like r4_flagship.sh.
set -eu
cd "$(dirname "$0")/.."

NAME=$(cat /root/data/r4_flagship.txt)
RUN=/root/data/runs/$NAME
E=$(ls "$RUN" | sed -n 's/^model-\([0-9]*\)\.msgpack$/\1/p' | sort -n | tail -1)
if [ -z "$E" ]; then
    echo "[r4_refiner] no flagship checkpoint in $RUN"
    exit 1
fi
echo "[r4_refiner] warm start from $RUN/model-$E"

python - "$RUN" "$E" <<'PYEOF'
import json, sys
run, e = sys.argv[1], sys.argv[2]
cfg = json.load(open("configs/SynthCars80kRefiner.json"))
cfg["training"]["pretraining"]["model"] = f"{run}/model-{e}"
json.dump(cfg, open("/root/data/SynthCars80kRefiner.json", "w"), indent=4)
print("patched config written to /root/data/SynthCars80kRefiner.json")
PYEOF

DEADLINE=$(cat /root/data/r4_deadline.txt 2>/dev/null || echo 0)
NOW=$(date +%s)
RESERVE=3600   # leave room for the max20cm eval + center-sup arm
if [ "$DEADLINE" -gt 0 ]; then
    BUDGET=$((DEADLINE - RESERVE - NOW))
else
    BUDGET=86400
fi
if [ "$BUDGET" -lt 600 ]; then
    echo "[r4_refiner] no time budget ($BUDGET s) — skipping"
    exit 1
fi
# refiner is ~65 s/epoch x 60 epochs ~= 70 min; cap the box's share
if [ "$BUDGET" -gt 6000 ]; then BUDGET=6000; fi
echo "[r4_refiner] training for up to $BUDGET s"
rc=0
timeout -k 60 "$BUDGET" bash scripts/train_supervised.sh \
    /root/data/SynthCars80kRefiner.json 1800 || rc=$?
RE=$(ls /root/data/runs/SynthCars80kRefiner 2>/dev/null \
     | sed -n 's/^model-\([0-9]*\)\.msgpack$/\1/p' | sort -n | tail -1)
echo "[r4_refiner] refiner at epoch ${RE:-none} (rc=$rc)"
if [ -z "$RE" ]; then exit 1; fi

# Max20cm reproduction row: flagship weights + 2-pass refiner + p2plane.
# The config pins weights at model-59; eval at the latest epoch we have
# (the config row is only final once RE=59, rc below enforces a replay).
echo "== Max20cm reproduction eval =="
python - "$RE" <<'PYEOF'
import json, sys
re_ = int(sys.argv[1])
cfg = json.load(open("configs/SynthCars80kMax20cm.json"))
cfg["evaluation"]["network_refine"]["weights"] = (
    f"/root/data/runs/SynthCars80kRefiner/model-{re_}")
json.dump(cfg, open("/root/data/SynthCars80kMax20cm_eval.json", "w"), indent=4)
print("eval config written")
PYEOF
timeout 5400 python scripts/eval_with_config.py \
    /root/data/SynthCars80kMax20cm_eval.json "$E" "$RUN" \
    --refineICP --method p2plane
if [ "$RE" -lt 59 ]; then
    echo "[r4_refiner] refiner incomplete ($RE < 59) — replay resumes"
    exit 1
fi
