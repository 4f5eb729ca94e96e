#!/bin/bash
# Round-5 DGCNN settlement probe (VERDICT r4 items 1+5): after the
# slot-map backward fix, re-record the on-chip smoke; if check 6
# (edge_train_fused) passes, flip the probe config's flag ON and measure
# the 3-epoch s/epoch against the round-4 unfused DGCNN and PN512 probes
# (/root/data/probe_SynthCars40k{DGCNN,PN512}Probe.log). The flip is a
# RUNTIME json edit gated on the committed smoke record — configs in git
# stay false until a passing record lands (round-4 advisor high finding).
set -u
cd "$(dirname "$0")/.."

# the queue's smoke_r5 step already recorded the fixed kernel on-chip;
# only re-run if the record is missing (replay on a fresh box)
if [ ! -f docs/onchip_smoke.json ]; then
    timeout 2400 python scripts/onchip_smoke.py \
        || echo "[r5_dgcnn_probe] smoke rc!=0 (see docs/onchip_smoke.json)"
fi
OK=$(python - <<'EOF'
import json
try:
    r = json.load(open("docs/onchip_smoke.json"))
    c = r["checks"].get("edge_train_fused", {})
    # the round-5 recheck adds a flagship-shape (N=1024) exactness row;
    # if present it must pass too (index-corruption class scales with N)
    c2 = r["checks"].get("edge_train_fused_n1024", {"ok": True})
    good = c.get("ok") and c2.get("ok")
    print("yes" if (good and c.get("fused_wins")) else
          ("exact" if good else "no"))
except Exception:
    print("no")
EOF
)
echo "[r5_dgcnn_probe] smoke check 6 gate: $OK"
if [ "$OK" = "no" ]; then
    echo "[r5_dgcnn_probe] fused backward still wrong on-chip — closure time"
    exit 1
fi
# exact-but-slower still merits the probe: kernel timing at smoke shapes
# (B=256) may not match training shapes (B=128/N=1024)
python - <<'EOF'
import json
p = "/root/data/SynthCars40kDGCNNFusedProbe_r5.json"
c = json.load(open("configs/SynthCars40kDGCNNFusedProbe.json"))
c["model"]["options"]["dgcnn_fused_train"] = True
json.dump(c, open(p, "w"), indent=4)
print("probe config written:", p)
EOF
DEADLINE=$(cat /root/data/r5_deadline.txt 2>/dev/null || echo 0)
BUDGET=3000
if [ "$DEADLINE" -gt 0 ]; then
    LEFT=$((DEADLINE - $(date +%s)))
    if [ "$LEFT" -lt 900 ]; then
        echo "[r5_dgcnn_probe] only ${LEFT}s left — skipping probe"
        exit 1
    fi
    [ $((LEFT - 300)) -lt "$BUDGET" ] && BUDGET=$((LEFT - 300))
fi
echo "== probe SynthCars40kDGCNNFusedProbe_r5 (fused ON, ${BUDGET}s box) =="
timeout "$BUDGET" python train.py train --config /root/data/SynthCars40kDGCNNFusedProbe_r5.json \
    > /root/data/probe_SynthCars40kDGCNNFusedProbe_r5.log 2>&1 || true
grep -E "Finished epoch" /root/data/probe_SynthCars40kDGCNNFusedProbe_r5.log || true
echo "== reference probes (same box, round-4 warm session) =="
grep -E "Finished epoch" /root/data/probe_SynthCars40kDGCNNProbe.log 2>/dev/null | tail -3 || true
grep -E "Finished epoch" /root/data/probe_SynthCars40kPN512Probe.log 2>/dev/null | tail -3 || true
