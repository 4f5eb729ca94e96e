#!/bin/bash
# Round-3 serialized TPU work queue (operational tool).
#
# The dev box wedges the TPU tunnel when two clients dispatch
# concurrently (CLAUDE.md gotchas), so all round-3 TPU jobs run through
# this single chain: wait for the 80k headline supervisor to finish,
# then run in PRIORITY order — headline gated-refine eval, the
# voxel-resample fine-tune (near-range density fix, see
# scripts/analyze_error_structure.py), the backbone comparison pair,
# the RANSAC hypothesis sweep, and the TTA probe. Each step is bounded
# with timeout and failures don't stop the chain (later steps are
# independent).
#
# Usage: scripts/round3_chain.sh [SUPERVISOR_PID]
set -u
SUP_PID="${1:-}"
cd "$(dirname "$0")/.."
# register as a stoppable TPU chain root (bench.py serialization guard)
PIDFILE=/tmp/tpu-chain-round3.pid
echo $$ > "$PIDFILE"
trap 'rm -f "$PIDFILE"' EXIT

log() { echo "[chain $(date '+%H:%M:%S')] $*"; }

if [ -n "$SUP_PID" ]; then
    log "waiting for 80k supervisor pid=$SUP_PID"
    while kill -0 "$SUP_PID" 2>/dev/null; do sleep 60; done
fi
log "80k supervisor done"

log "step 1: 80k headline eval with gated ICP refinement"
timeout -k 30 7200 python train.py eval_only \
    --config configs/SynthCars80k.json --refineICP --eval_epoch 209
log "step 1 rc=$?"

log "step 2: voxel-resample fine-tune (40 epochs from model-209)"
bash scripts/train_supervised.sh configs/SynthCars80kVox.json 1800
log "step 2 rc=$?"

log "step 2b: vox fine-tune refine eval + error-structure analysis"
timeout -k 30 7200 python train.py eval_only \
    --config configs/SynthCars80kVox.json --refineICP --eval_epoch 39
log "step 2b rc=$?"
for d in /root/data/runs/SynthCars80kVox/val/eval000039 \
         /root/data/runs/SynthCars80kVox/val/eval000039/refined_p2p; do
    [ -d "$d" ] && timeout 600 python scripts/analyze_error_structure.py \
        /root/data/SynthCars80k "$d"
done

log "step 3: PointNet N=512 comparison run (60 epochs)"
bash scripts/train_supervised.sh configs/SynthCars40kPN512.json 1800
log "step 3 rc=$?"

log "step 4: DGCNN N=512 comparison run (60 epochs)"
bash scripts/train_supervised.sh configs/SynthCars40kDGCNN.json 1800
log "step 4 rc=$?"

log "step 5: RANSAC hypothesis-count x mutual-filter sweep"
timeout -k 30 10800 python scripts/tune_ransac.py /root/data/SynthCars40k 512 0.35
log "step 5 rc=$?"

log "step 6: TTA multi-resample probe on the 80k model"
timeout -k 30 5400 python scripts/probe_tta.py \
    /root/data/runs/SynthCars80k/config.json 209 1 2 4 8
log "step 6 rc=$?"

log "chain complete"
