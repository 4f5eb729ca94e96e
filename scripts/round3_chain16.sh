#!/bin/bash
# Round-3 serialized TPU queue, link 16: per-view shape-prior A/B.
# docs/RESULTS.md identifies per-view center identifiability (~9 cm
# median per view) as the fine-bucket floor and names per-view shape
# priors as the lever. Arms (matched 120-epoch schedule, 40k scenes,
# N=1024, flip-aware composite loss):
#   base: configs/SynthCars40kBase.json (no prior)
#   comp: configs/SynthCars40kComp.json (+256-point canonical
#         completion decoder, flip-aware chamfer, weight 1.0)
# Then: eval tables for both + per-view s2-center error medians (the
# quantity the prior is supposed to move).
# Usage: scripts/round3_chain16.sh [PREV_CHAIN_PID]
set -u
PREV="${1:-}"
cd "$(dirname "$0")/.."
PIDFILE=/tmp/tpu-chain-round3-16.pid
echo $$ > "$PIDFILE"
trap 'rm -f "$PIDFILE"' EXIT
log() { echo "[chain16 $(date '+%H:%M:%S')] $*"; }
if [ -n "$PREV" ]; then
    log "waiting for chain pid=$PREV"
    while kill -0 "$PREV" 2>/dev/null; do sleep 60; done
fi

log "waiting for SynthCars40k generation to finish"
while [ ! -f /root/data/SynthCars40k/split/val.txt ]; do sleep 60; done
log "dataset ready"

log "step A: train base arm (120 epochs)"
bash scripts/train_supervised.sh configs/SynthCars40kBase.json 1800
log "step A rc=$?"

log "step B: train completion arm (120 epochs)"
bash scripts/train_supervised.sh configs/SynthCars40kComp.json 1800
log "step B rc=$?"

log "step C: eval histories"
for run in SynthCars40kBase SynthCars40kComp; do
    log "== $run =="
    python scripts/summarize_run.py /root/data/runs/$run --eval180 --last 6
done

log "step D: per-view s2-center error (the metric the prior targets)"
python3 - <<'PYEOF'
import json
import os
import sys

sys.path.insert(0, ".")
import numpy as np

from alignnet3d_tpu.data.provider import getDataFiles
from alignnet3d_tpu.geometry import str_to_np

base = "/root/data/SynthCars40k"
val = getDataFiles(f"{base}/split/val.txt")
metas = [json.load(open(f"{base}/meta/{i:08d}.json")) for i in val]
gt1 = np.stack([str_to_np(m["start_position"]).reshape(3) for m in metas])
gt2 = np.stack([str_to_np(m["end_position"]).reshape(3) for m in metas])
for run in ("SynthCars40kBase", "SynthCars40kComp"):
    d = f"/root/data/runs/{run}/val/eval000119"
    if not os.path.isdir(d):
        evals = sorted(
            p for p in os.listdir(f"/root/data/runs/{run}/val")
            if p.startswith("eval"))
        d = f"/root/data/runs/{run}/val/{evals[-1]}"
    c1 = np.load(f"{d}/pred_s2_pc1centers.npy")
    c2 = np.load(f"{d}/pred_s2_pc2centers.npy")
    e1 = np.linalg.norm((c1 - gt1)[:, :2], axis=1)
    e2 = np.linalg.norm((c2 - gt2)[:, :2], axis=1)
    e = np.concatenate([e1, e2])
    rel = np.linalg.norm(((c2 - c1) - (gt2 - gt1))[:, :2], axis=1)
    print(f"{run} ({os.path.basename(d)}): per-view center xy "
          f"p50={np.median(e)*100:.1f}cm p90={np.quantile(e,0.9)*100:.1f}cm"
          f" | center-DIFF xy p50={np.median(rel)*100:.1f}cm")
PYEOF
log "step D rc=$?"
log "chain16 done"
