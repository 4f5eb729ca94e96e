#!/bin/bash
# Round-4 spare-window probe: DGCNN 3-epoch s/epoch WITH the fused
# training edge stage (ops/edge_train_kernels.py), gated on the on-chip
# smoke having validated check 6 first (docs/onchip_smoke.json written
# by the eval_variants step). Compares against the same-box probe pair
# in /root/data/probe_SynthCars40k{PN512,DGCNN}Probe.log.
set -u
cd "$(dirname "$0")/.."
# Re-record the smoke first (this step owns the TPU slot): the fused
# backward was fixed twice this round (fori_loop stack bound, then the
# one-hot slot select after Mosaic refused dynamic_slice on values) and
# the gate below must read the CURRENT kernel's record, not a stale FAIL.
timeout 1800 python scripts/onchip_smoke.py \
    || echo "[r4_fused_probe] smoke still failing — gate will skip"
OK=$(python - <<'EOF'
import json
try:
    r = json.load(open("docs/onchip_smoke.json"))
    c = r["checks"].get("edge_train_fused", {})
    print("yes" if c.get("ok") else "no")
except Exception:
    print("no")
EOF
)
if [ "$OK" != "yes" ]; then
    echo "[r4_fused_probe] no passing on-chip record for edge_train_fused — skipping"
    exit 1
fi
echo "== probe SynthCars40kDGCNNFusedProbe =="
timeout 3000 python train.py train --config configs/SynthCars40kDGCNNFusedProbe.json \
    2>&1 | tee /root/data/probe_SynthCars40kDGCNNFusedProbe.log \
    | grep -E "EPOCH|Finished epoch" || true
grep -H "Finished epoch" /root/data/probe_SynthCars40kDGCNNFusedProbe.log
