#!/bin/bash
# Round-5 flagship eval rows for the 160k center-sup run: headline (own
# val, network refine + p2plane — directly comparable to the round-4
# 20.15/68.35/90.80 row), fresh seed-777 generalization, and a
# NETWORK-ONLY row (network_refine disabled) whose eval dir carries
# honest per-view s2-center predictions for the center-median diagnostic
# (VERDICT r4 item 2: refined evals origin-reset centers).
# Evals the LATEST numbered checkpoint; rc=1 until the final epoch
# exists so a queue replay re-evals after the resumed training finishes.
set -eu
cd "$(dirname "$0")/.."

# First claim of the post-flagship TPU slot: revalidate smoke check 6
# (fused edge-train backward) after the round-5 integer slot-select fix,
# and commit the record — the dgcnn_probe gate reads it (advisor r4
# high finding: configs stay false until a passing record is committed).
if [ ! -f /root/data/markers/smoke6_r5.done ]; then
    timeout 1800 python scripts/smoke6_recheck.py \
        || echo "[r5_eval160k] smoke6 recheck FAILED (see docs/onchip_smoke.json)"
    git add docs/onchip_smoke.json
    git commit -q -m "Re-record on-chip smoke check 6 after the integer slot-select fix" \
        || true
    touch /root/data/markers/smoke6_r5.done
fi

N=SynthCars160kCenterSup
RUN=/root/data/runs/$N
E=$(ls "$RUN" | sed -n 's/^model-\([0-9]*\)\.msgpack$/\1/p' | sort -n | tail -1)
if [ -z "$E" ]; then
    echo "[r5_eval160k] no checkpoint in $RUN"
    exit 1
fi
echo "[r5_eval160k] $N at epoch $E"
WANT=$(python -c "import json; print(json.load(open('configs/$N.json'))['training']['num_epochs'] - 1)")

# The round-5 deadline was extended mid-evening (round is ~12h, not the
# 00:10 the flagship's timebox assumed): if training was cut short,
# finish it BEFORE the eval rows — the final LR-decay epochs are worth
# more than interim rows, and every downstream step (Hard rows, radius
# sweep) then reads final weights. Reserve 16200s for this script's four
# rows + the later queue steps (same reserve the flagship used).
DEADLINE0=$(cat /root/data/r5_deadline.txt 2>/dev/null || echo 0)
if [ "$E" -lt "$WANT" ] && [ "$DEADLINE0" -gt 0 ]; then
    FBUDGET=$((DEADLINE0 - 16200 - $(date +%s)))
    if [ "$FBUDGET" -gt 7200 ]; then FBUDGET=7200; fi
    if [ "$FBUDGET" -gt 900 ]; then
        echo "[r5_eval160k] finishing $N: epoch $E -> $WANT (${FBUDGET}s box)"
        timeout -k 60 "$FBUDGET" bash scripts/train_supervised.sh "configs/$N.json" 1800 \
            || echo "[r5_eval160k] finish time-boxed (rc=$?)"
        E=$(ls "$RUN" | sed -n 's/^model-\([0-9]*\)\.msgpack$/\1/p' | sort -n | tail -1)
        echo "[r5_eval160k] now at epoch $E"
    fi
fi

python - "$N" <<'PYEOF'
import json, sys
name = sys.argv[1]
cfg = json.load(open(f"configs/{name}.json"))
fresh = json.loads(json.dumps(cfg))
fresh["data"]["basepath"] = "/root/data/SynthCarsValFresh"
json.dump(fresh, open(f"/root/data/{name}Fresh_eval.json", "w"), indent=4)
netonly = json.loads(json.dumps(cfg))
netonly["evaluation"]["network_refine"]["enabled"] = False
json.dump(netonly, open(f"/root/data/{name}NetOnly_eval.json", "w"), indent=4)
print("variant configs written")
PYEOF

echo "== headline: own val, network refine + p2plane =="
timeout 5400 python scripts/eval_with_config.py "configs/$N.json" $E "$RUN" \
    --refineICP --method p2plane
echo "== fresh seed-777 val =="
timeout 5400 python scripts/eval_with_config.py "/root/data/${N}Fresh_eval.json" $E "$RUN" \
    --refineICP --method p2plane
echo "== network-only (center diagnostic source) =="
timeout 5400 python scripts/eval_with_config.py "/root/data/${N}NetOnly_eval.json" $E "$RUN"

# Max20cm-style operating point on the 160k weights (round-4 recipe:
# 2-pass network refine with the retrained refiner + p2plane — the
# 22.05% <2cm peak). Only when the later steps' window is safe.
DEADLINE=$(cat /root/data/r5_deadline.txt 2>/dev/null || echo 0)
if [ "$DEADLINE" -eq 0 ] || [ $((DEADLINE - $(date +%s))) -gt 10800 ]; then
    python - "$N" <<'PYEOF'
import json, sys
name = sys.argv[1]
cfg = json.load(open(f"configs/{name}.json"))
mx = json.loads(json.dumps(cfg))
mx["evaluation"]["network_refine"]["weights"] = \
    "/root/data/runs/SynthCars80kRefiner/model-59"
mx["evaluation"]["network_refine"]["iterations"] = 2
json.dump(mx, open(f"/root/data/{name}Max_eval.json", "w"), indent=4)
print("max-stack config written")
PYEOF
    echo "== Max20cm-style stack (refiner net2 + p2plane) =="
    timeout 5400 python scripts/eval_with_config.py "/root/data/${N}Max_eval.json" $E "$RUN" \
        --refineICP --method p2plane || true
else
    echo "[r5_eval160k] window tight — skipping Max-stack row"
fi

if [ "$E" -lt "$WANT" ]; then
    echo "[r5_eval160k] flagship incomplete ($E < $WANT) — rows above are interim"
    exit 1
fi
