#!/bin/bash
# Round-5: measure the grid-connectivity clutter filter on the data it
# was built for (VERDICT r4 item 4 — data.denoise shipped in round 4 with
# zero Hard rows) and ship a Hard operating point. Rows, all against the
# best available flagship (160k if trained, else the round-4 80k):
#   1. Hard network-only (baseline; round-4 R4Base row: 2.80/25.05/41.15)
#   2. + denoise cell 0.5 central   3. + denoise cell 0.3 central
#   4. + denoise cell 0.5 largest   5. denoise 0.5 + p2plane refine
#   6. SynthCarsHardFT fine-tune (warm-start flagship, denoise on) +
#      its network-only and refined rows.
set -eu
cd "$(dirname "$0")/.."

DEADLINE=$(cat /root/data/r5_deadline.txt 2>/dev/null || echo 0)
# reserve 2700s for the steps after this one (DGCNN settlement probe +
# p2plane radius micro-sweep live in r5_dgcnn_probe.sh) — this script
# is greedy by construction and would otherwise starve them
left() {
    if [ "$DEADLINE" -gt 0 ]; then echo $((DEADLINE - 2700 - $(date +%s)));
    else echo 86400; fi
}
if [ "$(left)" -lt 900 ]; then
    echo "[r5_hard_rows] only $(left)s left — skipping"
    exit 1
fi

E=
for N in SynthCars80kCenterSupScratch SynthCars160kCenterSup SynthCars80kR4Base; do
    RUN=/root/data/runs/$N
    E=$(ls "$RUN" 2>/dev/null | sed -n 's/^model-\([0-9]*\)\.msgpack$/\1/p' | sort -n | tail -1 || true)
    [ -n "$E" ] && break
done
if [ -z "$E" ]; then
    echo "[r5_hard_rows] no flagship checkpoint found"
    exit 1
fi
echo "[r5_hard_rows] flagship $N at epoch $E"

python - "$N" "$E" <<'PYEOF'
import json, sys
name, epoch = sys.argv[1], sys.argv[2]
cfg = json.load(open(f"configs/{name}.json"))

def variant(tag, denoise=None, netrefine=False):
    c = json.loads(json.dumps(cfg))
    c["data"]["basepath"] = "/root/data/SynthCarsHard"
    if denoise is not None:
        c["data"]["denoise"] = denoise
    c["evaluation"]["network_refine"]["enabled"] = netrefine
    json.dump(c, open(f"/root/data/Hard{tag}_eval.json", "w"), indent=4)

variant("Plain")
variant("Dn50C", {"cell": 0.5, "keep": "central"})
variant("Dn30C", {"cell": 0.3, "keep": "central"})
variant("Dn50L", {"cell": 0.5, "keep": "largest"})
variant("Dn50Ref", {"cell": 0.5, "keep": "central"}, netrefine=True)

# fine-tune config: warm-start the flagship, denoise on in TRAINING
ft = json.load(open("configs/SynthCarsHardFT.json"))
ft["model"] = cfg["model"]
ft["logging"] = {"basedir": "/root/data/runs"}
ft["data"]["denoise"] = {"cell": 0.5, "keep": "central"}
ft["training"]["pretraining"] = {
    "model": f"/root/data/runs/{name}/model-{epoch}"}
json.dump(ft, open("/root/data/HardFT_r5.json", "w"), indent=4)
print("variant configs written")
PYEOF

# priority order: baseline + best-guess denoise first; cell/keep sweep
# rows only if the window allows (deadline-aware — VERDICT r4 item 4's
# must-haves are the Plain baseline, one denoise row, and the FT row)
for TAG in Plain Dn50C; do
    echo "== Hard $TAG (network-only) =="
    timeout 3600 python scripts/eval_with_config.py "/root/data/Hard${TAG}_eval.json" $E "$RUN"
done
for TAG in Dn30C Dn50L; do
    if [ "$(left)" -lt 5400 ]; then
        echo "[r5_hard_rows] $(left)s left — skipping sweep row $TAG"
        continue
    fi
    echo "== Hard $TAG (network-only) =="
    timeout 3600 python scripts/eval_with_config.py "/root/data/Hard${TAG}_eval.json" $E "$RUN"
done
if [ "$(left)" -gt 4500 ]; then
    echo "== Hard Dn50 + network refine + p2plane =="
    timeout 3600 python scripts/eval_with_config.py "/root/data/HardDn50Ref_eval.json" $E "$RUN" \
        --refineICP --method p2plane
else
    echo "[r5_hard_rows] $(left)s left — skipping refined row (window too small)"
fi

if [ "$(left)" -lt 2700 ]; then
    echo "[r5_hard_rows] $(left)s left — no room for the FT train+evals"
    exit 1
fi
FTBUDGET=$(( $(left) - 1200 )); [ "$FTBUDGET" -gt 5400 ] && FTBUDGET=5400
echo "== HardFT fine-tune (warm-start $N/model-$E, denoise on, ${FTBUDGET}s box) =="
timeout "$FTBUDGET" bash scripts/train_supervised.sh /root/data/HardFT_r5.json 1800 \
    || echo "[r5_hard_rows] FT time-boxed — evaluating what trained"
FTRUN=/root/data/runs/HardFT_r5
EF=$(ls "$FTRUN" | sed -n 's/^model-\([0-9]*\)\.msgpack$/\1/p' | sort -n | tail -1)
if [ -z "$EF" ]; then
    echo "[r5_hard_rows] no FT checkpoint — skipping FT rows"
    exit 1
fi
echo "== HardFT network-only (its own config evals with denoise) =="
python - <<'PYEOF'
import json
c = json.load(open("/root/data/HardFT_r5.json"))
c["evaluation"]["network_refine"]["enabled"] = False
json.dump(c, open("/root/data/HardFTNetOnly_eval.json", "w"), indent=4)
PYEOF
timeout 3600 python scripts/eval_with_config.py /root/data/HardFTNetOnly_eval.json $EF "$FTRUN"
echo "== HardFT + network refine + p2plane =="
timeout 3600 python scripts/eval_with_config.py /root/data/HardFT_r5.json $EF "$FTRUN" \
    --refineICP --method p2plane
