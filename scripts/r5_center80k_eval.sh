#!/bin/bash
# Round-5 valid center-supervision readout (VERDICT r4 item 2), slimmed
# for the post-flagship TPU window: the 80k center-sup run only reached
# epoch 11 before round-4 end and its resume step self-skips on budget,
# so interim rows from it are meaningless. The honest readout is instead
#   R4Base (80k, no center sup)   network-only eval  <- this script
#   160k center-sup flagship      network-only eval  <- r5_eval160k.sh
# compared on per-view s2-center xy medians by r4_ab_analysis.py, which
# now REFUSES refined eval dirs (their centers are origin-reset zeros —
# the round-4 decision artifact read those as 407cm medians).
# If the 80k center-sup run somehow got >=60 epochs, its network-only
# row is added as a same-scale arm.
set -eu
cd "$(dirname "$0")/.."

DEADLINE=$(cat /root/data/r5_deadline.txt 2>/dev/null || echo 0)
LEFT=$((DEADLINE - $(date +%s)))
if [ "$DEADLINE" -gt 0 ] && [ "$LEFT" -lt 900 ]; then
    echo "[r5_center80k_eval] only ${LEFT}s left — skipping"
    exit 1
fi

# First claim of this TPU slot: the round-5 HIGHEST-precision smoke
# rows (logic exactness with both sides f32-exact — see
# onchip_smoke._check_edge_train_fused_highest). The dgcnn_probe gate
# and the round-end fused-kernel verdict read this record.
if [ ! -f /root/data/markers/smoke6hp_r5.done ]; then
    timeout 1800 python scripts/smoke6_recheck.py \
        || echo "[r5_center80k_eval] smoke6 HP recheck FAILED (see docs/onchip_smoke.json)"
    git add docs/onchip_smoke.json
    git commit -q -m "Record on-chip HIGHEST-precision logic-exactness rows for the fused edge-train kernel" \
        || true
    touch /root/data/markers/smoke6hp_r5.done
fi

B=SynthCars80kR4Base
EB=$(ls /root/data/runs/$B | sed -n 's/^model-\([0-9]*\)\.msgpack$/\1/p' | sort -n | tail -1)
echo "[r5_center80k_eval] base $B at epoch $EB"

python - "$B" <<'PYEOF'
import json, sys
base = sys.argv[1]
bcfg = json.load(open(f"configs/{base}.json"))
bnet = json.loads(json.dumps(bcfg))
bnet["evaluation"]["network_refine"]["enabled"] = False
json.dump(bnet, open(f"/root/data/{base}NetOnly_eval.json", "w"), indent=4)
print("variant config written")
PYEOF

echo "== network-only: R4Base (center-diagnostic source) =="
timeout 3600 python scripts/eval_with_config.py \
    "/root/data/${B}NetOnly_eval.json" $EB "/root/data/runs/$B"

ARMS="--arm center160k=SynthCars160kCenterSupNetOnly_eval"
EC=$(ls /root/data/runs/SynthCars80kCenterSup 2>/dev/null \
     | sed -n 's/^model-\([0-9]*\)\.msgpack$/\1/p' | sort -n | tail -1 || true)
if [ -n "$EC" ] && [ "$EC" -ge 60 ]; then
    N=SynthCars80kCenterSup
    python - "$N" <<'PYEOF'
import json, sys
name = sys.argv[1]
cfg = json.load(open(f"configs/{name}.json"))
netonly = json.loads(json.dumps(cfg))
netonly["evaluation"]["network_refine"]["enabled"] = False
json.dump(netonly, open(f"/root/data/{name}NetOnly_eval.json", "w"), indent=4)
PYEOF
    echo "== network-only: 80k center-sup (epoch $EC) =="
    timeout 3600 python scripts/eval_with_config.py \
        "/root/data/${N}NetOnly_eval.json" $EC "/root/data/runs/$N"
    ARMS="$ARMS --arm center80k=${N}NetOnly_eval"
fi

echo "== per-view center medians (network-only dirs only) =="
python scripts/r4_ab_analysis.py \
    --base "${B}NetOnly_eval" $ARMS \
    --out /root/data/r5_center_decision.json
cat /root/data/r5_center_decision.json
