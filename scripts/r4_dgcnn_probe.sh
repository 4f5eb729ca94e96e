#!/bin/bash
# DGCNN training-cost probe (VERDICT r3 item 3): 3 epochs each of the
# N=512 PointNet and DGCNN configs on SynthCars40k, same box and batch
# size, to measure the DGCNN epoch premium WITH the round-3/4 fast path
# (flat row gather + fused Pallas kNN, backbones.py) that the round-3
# 4.1x figure predates. Decision input for an 80k DGCNN flagship.
set -u
cd "$(dirname "$0")/.."
for CFG in SynthCars40kPN512Probe SynthCars40kDGCNNProbe; do
    echo "== probe $CFG =="
    timeout 3000 python train.py train --config "configs/$CFG.json" \
        2>&1 | tee "/root/data/probe_$CFG.log" | grep -E "EPOCH|Finished epoch|eval_180|Eval" || true
done
echo "== epoch wall times =="
grep -H "Finished epoch" /root/data/probe_SynthCars40k*Probe.log
