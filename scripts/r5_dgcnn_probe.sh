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
    # round-5 gate: the default-precision row carries the bf16
    # envelope + timing; LOGIC exactness is the two HIGHEST-precision
    # rows (timing shape + flagship N=1024 shape, where the
    # index-corruption class lives). All three must pass.
    ch = r["checks"].get("edge_train_fused_highest", {})
    c2 = r["checks"].get("edge_train_fused_n1024", {})
    good = c.get("ok") and ch.get("ok") and c2.get("ok")
    print("yes" if (good and c.get("fused_wins")) else
          ("exact" if good else "no"))
except Exception:
    print("no")
EOF
)
echo "[r5_dgcnn_probe] smoke check 6 gate: $OK"
DEADLINE=$(cat /root/data/r5_deadline.txt 2>/dev/null || echo 0)
left() {
    if [ "$DEADLINE" -gt 0 ]; then echo $((DEADLINE - $(date +%s)));
    else echo 86400; fi
}
if [ "$OK" = "no" ]; then
    echo "[r5_dgcnn_probe] fused backward still wrong on-chip — closure time"
elif [ "$(left)" -lt 1200 ]; then
    echo "[r5_dgcnn_probe] only $(left)s left — skipping probe"
else
    # exact-but-slower still merits the probe: kernel timing at smoke
    # shapes (B=256) may not match training shapes (B=128/N=1024)
    python - <<'EOF'
import json
p = "/root/data/SynthCars40kDGCNNFusedProbe_r5.json"
c = json.load(open("configs/SynthCars40kDGCNNFusedProbe.json"))
c["model"]["options"]["dgcnn_fused_train"] = True
json.dump(c, open(p, "w"), indent=4)
print("probe config written:", p)
EOF
    BUDGET=3000
    [ $(($(left) - 300)) -lt "$BUDGET" ] && BUDGET=$(($(left) - 300))
    echo "== probe SynthCars40kDGCNNFusedProbe_r5 (fused ON, ${BUDGET}s box) =="
    timeout "$BUDGET" python train.py train --config /root/data/SynthCars40kDGCNNFusedProbe_r5.json \
        > /root/data/probe_SynthCars40kDGCNNFusedProbe_r5.log 2>&1 || true
    grep -E "Finished epoch" /root/data/probe_SynthCars40kDGCNNFusedProbe_r5.log || true
    # same-box unfused premium baseline (round-4 logs died with the box)
    if [ "$(left)" -gt 2400 ]; then
        echo "== probe SynthCars40kDGCNNProbe (unfused, same box) =="
        timeout 1800 python train.py train --config configs/SynthCars40kDGCNNProbe.json \
            > /root/data/probe_SynthCars40kDGCNNProbe.log 2>&1 || true
        grep -E "Finished epoch" /root/data/probe_SynthCars40kDGCNNProbe.log || true
    fi
fi

# ---- p2plane radius micro-sweep (VERDICT r4 item 6c): chase the <2cm
# bucket against the 160k flagship's 0.1-radius default. Two rows,
# ~10 min each, skipped individually when the window closes.
E=
for N in SynthCars80kCenterSupScratch SynthCars160kCenterSup; do
    RUN=/root/data/runs/$N
    E=$(ls "$RUN" 2>/dev/null | sed -n 's/^model-\([0-9]*\)\.msgpack$/\1/p' | sort -n | tail -1 || true)
    [ -n "$E" ] && break
done
if [ -n "$E" ]; then
    for R in 0.05 0.15; do
        if [ "$(left)" -lt 1500 ]; then
            echo "[r5_sweep] $(left)s left — skipping radius $R"
            continue
        fi
        TAG=$(echo "$R" | tr -d '.')
        python - "$N" "$R" "$TAG" <<'PYEOF'
import json, sys
name, radius, tag = sys.argv[1], float(sys.argv[2]), sys.argv[3]
c = json.load(open(f"configs/{name}.json"))
c["evaluation"]["refinement"]["radius"] = radius
json.dump(c, open(f"/root/data/{name}Rad{tag}_eval.json", "w"), indent=4)
PYEOF
        echo "== p2plane radius $R ($N val, refined) =="
        timeout 1800 python scripts/eval_with_config.py \
            "/root/data/${N}Rad${TAG}_eval.json" $E "$RUN" \
            --refineICP --method p2plane || true
    done
fi

# ---- steps-per-dispatch on-chip probe: measure the multi-step
# (lax.scan-in-one-jit) training path vs the per-step dispatch on the
# PN512 probe shapes (trainer._train_multi_step_fn, round-5 final
# session). 3 epochs each; the s/epoch pair is the RESULTS datum.
if [ "$(left)" -ge 1800 ]; then
    python - <<'EOF'
import json
c = json.load(open("configs/SynthCars40kPN512Probe.json"))
c["logging"] = {"basedir": "/root/data/runs"}
# eval only first/last: epoch 1's wall time is then the pure
# train-dispatch signal in both arms
c["evaluation"]["eval_every"] = 5
json.dump(c, open("/root/data/SynthCars40kPN512ProbeK1.json", "w"), indent=4)
c["tpu"] = dict(c.get("tpu", {}), steps_per_dispatch=8)
json.dump(c, open("/root/data/SynthCars40kPN512ProbeK8.json", "w"), indent=4)
print("multistep probe configs written")
EOF
    for V in K1 K8; do
        echo "== probe PN512 steps_per_dispatch $V =="
        timeout 900 python train.py train \
            --config /root/data/SynthCars40kPN512Probe${V}.json \
            > /root/data/probe_PN512_${V}.log 2>&1 || true
        grep -E "Finished epoch" /root/data/probe_PN512_${V}.log || true
    done
else
    echo "[r5_multistep_probe] $(left)s left — skipping"
fi

# ---- buffer consumer: DGCNN retrain on CORRECTED
# gradients (round-5 finding: XLA's jit max-VJP dropped 58% of the
# DGCNN training gradient in rel-L2 — every historical DGCNN row
# trained on those gradients, incl. round-3's 79.2% <20cm at
# 40k/N512/60ep). With stable_max routing this is the repo's last
# unmeasured accuracy lever; it outranks the 80k center-sup resume,
# whose question the 40k A/B + the 160k flagship (center-sup arm)
# already answer. Adaptive scale: 80k full-lever config when the
# window is wide, else a 40k variant epoch-comparable to round 3.
# Fused kernel rides along only when the gate above said "yes"
# (exact AND faster); "exact" alone stays unfused.
if [ "$(left)" -ge 3000 ]; then
    if [ "$(left)" -ge 12000 ]; then DC=SynthCars80kDGCNNStableR5;
    else DC=SynthCars40kDGCNNStableR5; fi
    python - "$DC" "$OK" <<'PYEOF'
import json, sys
name, gate = sys.argv[1], sys.argv[2]
c = json.load(open("configs/SynthCars80kDGCNNStableR5.json"))
if name.startswith("SynthCars40k"):
    c["data"]["basepath"] = "/root/data/SynthCars40k"
    c["training"]["num_epochs"] = 60
c["model"]["options"]["dgcnn_fused_train"] = gate == "yes"
c["logging"] = {"basedir": "/root/data/runs"}
json.dump(c, open(f"/root/data/{name}.json", "w"), indent=4)
print("stable-DGCNN config written:", name, "fused:", gate == "yes")
PYEOF
    RBUDGET=$(($(left) - 1500))
    echo "== stable-gradient DGCNN retrain $DC (${RBUDGET}s box) =="
    timeout -k 60 "$RBUDGET" bash scripts/train_supervised.sh \
        "/root/data/$DC.json" 1800 \
        || echo "[r5_dgcnn_stable] time-boxed (rc=$?)"
    ED=$(ls /root/data/runs/$DC 2>/dev/null \
         | sed -n 's/^model-\([0-9]*\)\.msgpack$/\1/p' | sort -n | tail -1 || true)
    if [ -n "$ED" ] && [ "$(left)" -ge 900 ]; then
        python - "$DC" <<'PYEOF'
import json, sys
name = sys.argv[1]
cfg = json.load(open(f"/root/data/{name}.json"))
cfg["evaluation"]["network_refine"]["enabled"] = False
json.dump(cfg, open(f"/root/data/{name}NetOnly_eval.json", "w"), indent=4)
PYEOF
        echo "== network-only: $DC (epoch $ED) =="
        timeout 2400 python scripts/eval_with_config.py \
            "/root/data/${DC}NetOnly_eval.json" $ED "/root/data/runs/$DC" || true
    fi
else
    echo "[r5_dgcnn_stable] $(left)s left — window too small, skipping"
fi
