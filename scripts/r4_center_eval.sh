#!/bin/bash
# Round-4 center-sup flagship eval rows: headline (own 80k val, network
# refine + p2plane, directly comparable to the R4Base 20.15/68.35/90.80
# row) and the fresh seed-777 generalization row. Evals the LATEST
# numbered checkpoint so a time-boxed flagship still yields interim rows;
# rc=1 until the final epoch exists (queue replays on a later slot).
set -eu
cd "$(dirname "$0")/.."
N=SynthCars80kCenterSup
RUN=/root/data/runs/$N
E=$(ls "$RUN" | sed -n 's/^model-\([0-9]*\)\.msgpack$/\1/p' | sort -n | tail -1)
if [ -z "$E" ]; then
    echo "[r4_center_eval] no checkpoint in $RUN"
    exit 1
fi
echo "[r4_center_eval] $N at epoch $E"
WANT=$(python -c "import json; print(json.load(open('configs/$N.json'))['training']['num_epochs'] - 1)")

python - "$N" <<'PYEOF'
import json, sys
name = sys.argv[1]
cfg = json.load(open(f"configs/{name}.json"))
c = json.loads(json.dumps(cfg))
c["data"]["basepath"] = "/root/data/SynthCarsValFresh"
json.dump(c, open(f"/root/data/{name}Fresh_eval.json", "w"), indent=4)
print("variant config written")
PYEOF

echo "== headline: own val, network refine + p2plane =="
timeout 5400 python scripts/eval_with_config.py "configs/$N.json" $E "$RUN" \
    --refineICP --method p2plane
echo "== fresh seed-777 val =="
timeout 5400 python scripts/eval_with_config.py "/root/data/${N}Fresh_eval.json" $E "$RUN" \
    --refineICP --method p2plane

# per-view center medians (the A/B decision metric) on the headline run
python scripts/r4_ab_analysis.py --arm center80k=$N \
    --out /root/data/r4_center80k_decision.json || true

if [ "$E" -lt "$WANT" ]; then
    echo "[r4_center_eval] flagship incomplete ($E < $WANT) — rows above are interim"
    exit 1
fi
