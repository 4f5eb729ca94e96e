#!/bin/bash
# Run the full ICP baseline matrix (equivalent of reference eval_icp.sh).
# Order matters: the *_p2p refine variants reuse the outputs of their base
# global-registration runs (alignnet3d_tpu/icp/runner.py).
set -e

DATASETS="SynthCars SynthCarsPersons Synth20 Synth20others \
KITTITrackletsCars KITTITrackletsCarsPersons \
KITTITrackletsCarsHard KITTITrackletsCarsPersonsHard"

python make_icp_configs.py

for ds in $DATASETS; do
    for variant in o3_p2p o3_gicp o3_gicp_fast o3_gicp_p2p o3_gicp_fast_p2p; do
        cfg="configs/icp_${ds}_${variant}.json"
        if [ -f "$cfg" ]; then
            echo "=== $cfg ==="
            python train.py train --config "$cfg" || echo "FAILED: $cfg"
        fi
    done
done
