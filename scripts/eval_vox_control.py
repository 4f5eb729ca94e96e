"""Control eval: BASE 80k model weights + voxel-resampled eval inputs.

Separates the two levers in the SynthCars80kVox fine-tune (weights
adapted to the density-equalized inputs vs the inputs alone): if this
control already recovers the near-range deficit, the fine-tune was
unnecessary; if it degrades (the model never saw equalized density), the
fine-tune is load-bearing. Writes into its own run dir (SynthCars80kVoxCtl)
so the headline eval000209 artifacts stay untouched.

Usage: python scripts/eval_vox_control.py [epoch=209] [voxel=0.05]
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    epoch = int(sys.argv[1]) if len(sys.argv) > 1 else 209
    voxel = float(sys.argv[2]) if len(sys.argv) > 2 else 0.05

    base_run = "/root/data/runs/SynthCars80k"
    cfg = json.load(open("configs/SynthCars80k.json"))
    cfg["data"]["resample"] = {"mode": "voxel", "voxel_size": voxel}
    cfg_path = "/tmp/SynthCars80kVoxCtl.json"
    json.dump(cfg, open(cfg_path, "w"))

    from alignnet3d_tpu.config import load_config
    from alignnet3d_tpu.training.trainer import Trainer

    c = load_config(cfg_path)
    trainer = Trainer(c, seed=0)
    trainer.train(eval_only=True, eval_epoch=epoch,
                  eval_only_model_to_load=base_run)
    ev = (f"{trainer.logdir}/val/eval{str(epoch).zfill(6)}/eval_180.json")
    levels = json.load(open(ev))["corr_levels"]
    print("vox-control eval_180 corr_levels:", levels)


if __name__ == "__main__":
    main()
