#!/bin/bash
# Round-3 serialized TPU queue, link 6: rerun of the two main-chain
# failures after their fixes —
#   * tune_ransac OOM'd at B=512 in one launch (17.7 GB FPFH neighbor
#     gather) and K=16384 flat vmap; fixed by pair chunking (128) in the
#     script + lax.map hypothesis chunking in fpfh.ransac_registration.
#   * probe_tta resolved the checkpoint from the config filename stem
#     ("config" -> runs/config/); fixed to restore from the config's own
#     dir when the checkpoint lives there.
#
# Usage: scripts/round3_chain6.sh [PREV_CHAIN_PID]
set -u
PREV="${1:-}"
cd "$(dirname "$0")/.."
PIDFILE=/tmp/tpu-chain-round3-6.pid
echo $$ > "$PIDFILE"
trap 'rm -f "$PIDFILE"' EXIT

log() { echo "[chain6 $(date '+%H:%M:%S')] $*"; }

if [ -n "$PREV" ]; then
    log "waiting for chain pid=$PREV"
    while kill -0 "$PREV" 2>/dev/null; do sleep 60; done
fi
log "previous chain done"

log "step A: RANSAC hypothesis-count x mutual-filter sweep (retry, chunked)"
timeout -k 30 10800 python scripts/tune_ransac.py /root/data/SynthCars40k 512 0.35
log "step A rc=$?"

log "step B: TTA multi-resample probe on the 80k model (retry, fixed ckpt path)"
timeout -k 30 5400 python scripts/probe_tta.py \
    /root/data/runs/SynthCars80k 209 1 2 4 8
log "step B rc=$?"

log "chain6 complete"
