#!/bin/bash
# Round-4 flagship eval rows: headline (own val, p2plane refine), fresh
# seed-777 generalization, and the Hard robustness table (plain + refined).
# Reads the flagship run name from /root/data/r4_flagship.txt and
# synthesizes arch-matched variant configs (the completion head changes the
# param tree, so variants must inherit the picked config).
set -eu
cd "$(dirname "$0")/.."
N=$(cat /root/data/r4_flagship.txt)
RUN=/root/data/runs/$N
# latest numbered checkpoint — NOT a hard-coded final epoch, so a
# round-end kill mid-flagship still yields eval rows (queue replays
# this step after the resumed training adds later checkpoints)
E=$(ls "$RUN" | sed -n 's/^model-\([0-9]*\)\.msgpack$/\1/p' | sort -n | tail -1)
echo "[r4_eval_variants] flagship $N at epoch $E"
WANT=$(python -c "import json; print(json.load(open('configs/$N.json'))['training']['num_epochs'] - 1)")

python - "$N" <<'PYEOF'
import json, sys
name = sys.argv[1]
cfg = json.load(open(f"configs/{name}.json"))
for tag, basepath in (("Fresh", "/root/data/SynthCarsValFresh"),
                      ("Hard", "/root/data/SynthCarsHard")):
    c = json.loads(json.dumps(cfg))
    c["data"]["basepath"] = basepath
    json.dump(c, open(f"/root/data/{name}{tag}_eval.json", "w"), indent=4)
print("variant configs written")
PYEOF

echo "== headline: own val, network refine + p2plane =="
timeout 5400 python scripts/eval_with_config.py "configs/$N.json" $E "$RUN" \
    --refineICP --method p2plane
echo "== fresh seed-777 val =="
timeout 5400 python scripts/eval_with_config.py "/root/data/${N}Fresh_eval.json" $E "$RUN" \
    --refineICP --method p2plane
echo "== hard robustness: network-only =="
timeout 5400 python scripts/eval_with_config.py "/root/data/${N}Hard_eval.json" $E "$RUN"
echo "== hard robustness: + p2plane refine =="
timeout 5400 python scripts/eval_with_config.py "/root/data/${N}Hard_eval.json" $E "$RUN" \
    --refineICP --method p2plane

# on-chip record for the round-4 fused TRAINING edge stage (check 6,
# ops/edge_train_kernels.py) — this step owns the TPU slot, so the
# smoke can run here without violating the one-client rule
timeout 1800 python scripts/onchip_smoke.py \
    || echo "[r4_eval_variants] smoke FAILED (see docs/onchip_smoke.json)"

# rc=1 when the flagship had not reached its final epoch: the queue then
# leaves no .done marker and a later replay re-evals at the final ckpt
if [ "$E" -lt "$WANT" ]; then
    echo "[r4_eval_variants] flagship incomplete ($E < $WANT) — rows above are interim"
    exit 1
fi
