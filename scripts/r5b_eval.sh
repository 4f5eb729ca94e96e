#!/bin/bash
# Round-5 final-session flagship eval rows (VERDICT r4 items 2+3 at the
# scale the wiped box allows): headline (own val, network refine +
# p2plane — comparable to the round-4 20.15/68.35/90.80 R4Base row),
# fresh seed-777 generalization, and a NETWORK-ONLY row whose eval dir
# carries honest per-view s2-center predictions for the center-median
# diagnostic (refined evals origin-reset centers — round-4 artifact bug).
# Evals the LATEST checkpoint; finishes a time-boxed training first when
# the window allows, so rows read final-LR weights.
set -eu
cd "$(dirname "$0")/.."

N=SynthCars80kCenterSupScratch
RUN=/root/data/runs/$N
E=$(ls "$RUN" | sed -n 's/^model-\([0-9]*\)\.msgpack$/\1/p' | sort -n | tail -1)
if [ -z "$E" ]; then
    echo "[r5b_eval] no checkpoint in $RUN"
    exit 1
fi
WANT=$(python -c "import json; print(json.load(open('configs/$N.json'))['training']['num_epochs'] - 1)")
DEADLINE=$(cat /root/data/r5_deadline.txt 2>/dev/null || echo 0)
# finish only a genuinely short run: past epoch ~90 the round-3 80k
# trajectory is already in its flat tail (85/55 bars cleared by epoch
# 89) and the remaining TPU window is worth more as Hard/probe rows
if [ "$E" -lt 90 ] && [ "$E" -lt "$WANT" ] && [ "$DEADLINE" -gt 0 ]; then
    FBUDGET=$((DEADLINE - 6600 - $(date +%s)))   # keep eval+hard+probe alive
    if [ "$FBUDGET" -gt 3600 ]; then FBUDGET=3600; fi
    if [ "$FBUDGET" -gt 900 ]; then
        echo "[r5b_eval] finishing $N: epoch $E -> $WANT (${FBUDGET}s box)"
        timeout -k 60 "$FBUDGET" bash scripts/train_supervised.sh "configs/$N.json" 1800 \
            || echo "[r5b_eval] finish time-boxed (rc=$?)"
        E=$(ls "$RUN" | sed -n 's/^model-\([0-9]*\)\.msgpack$/\1/p' | sort -n | tail -1)
        echo "[r5b_eval] now at epoch $E"
    fi
fi
echo "[r5b_eval] $N at epoch $E"

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
timeout 3600 python scripts/eval_with_config.py "configs/$N.json" $E "$RUN" \
    --refineICP --method p2plane
echo "== fresh seed-777 val =="
timeout 3600 python scripts/eval_with_config.py "/root/data/${N}Fresh_eval.json" $E "$RUN" \
    --refineICP --method p2plane
echo "== network-only (center diagnostic source) =="
timeout 3600 python scripts/eval_with_config.py "/root/data/${N}NetOnly_eval.json" $E "$RUN"

echo "== per-view center medians (network-only dir) =="
python - <<'PYEOF'
import json, os, sys
sys.path.insert(0, ".")
import numpy as np
from alignnet3d_tpu.data.provider import getDataFiles
from alignnet3d_tpu.geometry import str_to_np

run = "SynthCars80kCenterSupScratchNetOnly_eval"
vd = f"/root/data/runs/{run}/val"
evals = sorted(p for p in os.listdir(vd) if p.startswith("eval")
               and os.path.isfile(f"{vd}/{p}/eval_180.json"))
d = f"{vd}/{evals[-1]}"
c1 = np.load(f"{d}/pred_s2_pc1centers.npy")
c2 = np.load(f"{d}/pred_s2_pc2centers.npy")
assert np.any(np.abs(c1) > 1e-9), "refined dir — centers origin-reset"
cfg = json.load(open(f"/root/data/runs/{run}/config.json"))
val = getDataFiles(cfg["data"]["basepath"] + "/split/val.txt")
metas = [json.load(open(cfg["data"]["basepath"] + f"/meta/{i:08d}.json"))
         for i in val]
g1 = np.stack([str_to_np(m["start_position"]).reshape(3) for m in metas])
g2 = np.stack([str_to_np(m["end_position"]).reshape(3) for m in metas])
e = np.concatenate([np.linalg.norm((c1 - g1)[:, :2], axis=1),
                    np.linalg.norm((c2 - g2)[:, :2], axis=1)])
rel = np.linalg.norm(((c2 - c1) - (g2 - g1))[:, :2], axis=1)
out = {"run": run, "eval_dir": d,
       "perview_center_median_cm": float(np.median(e) * 100),
       "relative_center_median_cm": float(np.median(rel) * 100),
       "n_pairs": int(len(val))}
json.dump(out, open("/root/data/r5_center_decision.json", "w"), indent=2)
print(json.dumps(out, indent=2))
PYEOF

if [ "$E" -lt "$WANT" ]; then
    echo "[r5b_eval] flagship incomplete ($E < $WANT) — rows above are interim"
    exit 1
fi
