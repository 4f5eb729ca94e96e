#!/bin/bash
# Round-5: valid readout for the finished 80k center-sup flagship
# (VERDICT r4 item 2). Headline + fresh rows like r4_center_eval.sh,
# PLUS network-only evals of BOTH 80k flagships (center-sup and R4Base)
# so the per-view center-median comparison reads real predictions — the
# round-4 decision artifact read origin-reset zeros from refined evals.
set -eu
cd "$(dirname "$0")/.."
N=SynthCars80kCenterSup
B=SynthCars80kR4Base
RUN=/root/data/runs/$N
E=$(ls "$RUN" | sed -n 's/^model-\([0-9]*\)\.msgpack$/\1/p' | sort -n | tail -1)
if [ -z "$E" ]; then
    echo "[r5_center80k_eval] no checkpoint in $RUN"
    exit 1
fi
EB=$(ls /root/data/runs/$B | sed -n 's/^model-\([0-9]*\)\.msgpack$/\1/p' | sort -n | tail -1)
echo "[r5_center80k_eval] $N at epoch $E (base $B at $EB)"
WANT=$(python -c "import json; print(json.load(open('configs/$N.json'))['training']['num_epochs'] - 1)")

python - "$N" "$B" <<'PYEOF'
import json, sys
name, base = sys.argv[1], sys.argv[2]
cfg = json.load(open(f"configs/{name}.json"))
fresh = json.loads(json.dumps(cfg))
fresh["data"]["basepath"] = "/root/data/SynthCarsValFresh"
json.dump(fresh, open(f"/root/data/{name}Fresh_eval.json", "w"), indent=4)
netonly = json.loads(json.dumps(cfg))
netonly["evaluation"]["network_refine"]["enabled"] = False
json.dump(netonly, open(f"/root/data/{name}NetOnly_eval.json", "w"), indent=4)
bcfg = json.load(open(f"configs/{base}.json"))
bnet = json.loads(json.dumps(bcfg))
bnet["evaluation"]["network_refine"]["enabled"] = False
json.dump(bnet, open(f"/root/data/{base}NetOnly_eval.json", "w"), indent=4)
print("variant configs written")
PYEOF

echo "== headline: own val, network refine + p2plane =="
timeout 5400 python scripts/eval_with_config.py "configs/$N.json" $E "$RUN" \
    --refineICP --method p2plane
echo "== fresh seed-777 val =="
timeout 5400 python scripts/eval_with_config.py "/root/data/${N}Fresh_eval.json" $E "$RUN" \
    --refineICP --method p2plane
echo "== network-only: center-sup =="
timeout 5400 python scripts/eval_with_config.py "/root/data/${N}NetOnly_eval.json" $E "$RUN"
echo "== network-only: R4Base =="
timeout 5400 python scripts/eval_with_config.py "/root/data/${B}NetOnly_eval.json" $EB "/root/data/runs/$B"

echo "== per-view center medians (network-only dirs only) =="
python scripts/r4_ab_analysis.py \
    --base "${B}NetOnly_eval" \
    --arm center80k="${N}NetOnly_eval" \
    --out /root/data/r5_center80k_decision.json

if [ "$E" -lt "$WANT" ]; then
    echo "[r5_center80k_eval] flagship incomplete ($E < $WANT) — rows above are interim"
    exit 1
fi
