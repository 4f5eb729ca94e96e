"""Evaluate an arbitrary config against another run's checkpoints.

Generalizes the control-eval pattern: load <config.json> (its name
derives a FRESH logdir, so existing artifacts are never clobbered),
restore model-<epoch> from <model_dir>, run one eval pass, print the
eval_180 levels. Used for input-ablation controls (voxel resample) and
refinement-variant evals (gate/cascade settings) that reuse the same
trained weights.

Usage: python scripts/eval_with_config.py <config.json> <epoch> <model_dir>
           [--refineICP] [--its N] [--method p2p|p2plane]
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    cfg_path, epoch, model_dir = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    refine = "--refineICP" in sys.argv
    its = (int(sys.argv[sys.argv.index("--its") + 1])
           if "--its" in sys.argv else 30)
    method = (sys.argv[sys.argv.index("--method") + 1]
              if "--method" in sys.argv else "p2p")

    from alignnet3d_tpu.config import load_config
    from alignnet3d_tpu.training.trainer import Trainer

    cfg = load_config(cfg_path)
    trainer = Trainer(cfg, seed=0)
    trainer.train(eval_only=True, eval_epoch=epoch, refine_icp=refine,
                  icp_its=its, icp_method=method,
                  eval_only_model_to_load=model_dir)
    ed = f"{trainer.logdir}/val/eval{str(epoch).zfill(6)}"
    if refine:
        # mirror the trainer's dir naming (config method override wins)
        if (cfg.evaluation.has("refinement")
                and cfg.evaluation.refinement.has("method")):
            method = cfg.evaluation.refinement.method
        ed = f"{ed}/refined_{method}" + (f"_{its}" if its != 30 else "")
    ev = json.load(open(f"{ed}/eval_180.json"))
    print(f"eval_180 corr_levels: {ev['corr_levels']}  "
          f"mean_t {ev['mean_dist_translation']:.4f}  "
          f"mean_a {ev['mean_dist_angle']:.4f}")


if __name__ == "__main__":
    main()
