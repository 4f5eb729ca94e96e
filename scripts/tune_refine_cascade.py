"""Two-stage (coarse -> fine) gated ICP refinement experiment (round 3).

Round-2 gate tuning showed r=0.10 wins <10/20 cm while r=0.05/45-its
wins yaw and runs 3x faster, suggesting a cascade: refine with the
coarse radius to settle the basin, then polish with the fine radius for
the 2 cm bucket. Both stages use the fitness+trust gate. Runs from a
finished eval's cached predictions; scores val AND test (positions >=
1000) like the metric pipeline.

Usage: python scripts/tune_refine_cascade.py <run_config.json> <epoch>
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    cfg_path, epoch = sys.argv[1], int(sys.argv[2])
    from alignnet3d_tpu.config import load_config
    from alignnet3d_tpu.data import provider
    from alignnet3d_tpu.icp.p2point import refine_predictions

    cfg = load_config(cfg_path)
    run_dir = cfg.logging.logdir
    eval_dir = os.path.join(run_dir, "val", f"eval{epoch:06d}")
    pred_t = np.load(f"{eval_dir}/pred_translations.npy")
    pred_a = np.load(f"{eval_dir}/pred_angles.npy")
    pred_c = np.load(f"{eval_dir}/pred_s2_pc1centers.npy")

    val_idxs = provider.getDataFiles(f"{cfg.data.basepath}/split/val.txt")
    ds = provider.PackedDataset(cfg.data.basepath)
    rows = ds.rows(val_idxs)
    gt_t = ds.translations[rows].reshape(-1, 3)
    gt_a = ds.rel_angles[rows].reshape(-1)
    gt_c = ds.pc1centers[rows].reshape(-1, 3)
    from alignnet3d_tpu.evaluation.quickscore import format_table, success_table

    def score(label, t, a, c, secs):
        tab = success_table(t, a, c, gt_t, gt_a, gt_c)
        print(f"{label:28s} {format_table(tab)}  "
              f"({1e3*secs/len(val_idxs):.0f} ms/pair)", flush=True)

    score("network init", pred_t, pred_a, pred_c, 0.0)

    gate = dict(gate=True, gate_max_dyaw_deg=10.0, gate_max_dxy=0.5)
    stage1, t1 = refine_predictions(
        cfg, val_idxs, pred_t, pred_a, pred_c, its=30, radius=0.10,
        dataset=ds, **gate,
    )
    zeros = np.zeros_like(pred_c)
    score("coarse r=0.10 (shipped)", stage1["translations"],
          stage1["angles"], zeros, t1)

    fine, t2 = refine_predictions(
        cfg, val_idxs, pred_t, pred_a, pred_c, its=45, radius=0.05,
        dataset=ds, **gate,
    )
    score("fine r=0.05 only", fine["translations"], fine["angles"],
          zeros, t2)

    # cascade: fine stage starts from the coarse result (world frame,
    # rotation center at origin) with a tight trust region — it may only
    # polish, not re-basin
    cascade, t3 = refine_predictions(
        cfg, val_idxs, stage1["translations"], stage1["angles"], zeros,
        its=45, radius=0.05, dataset=ds,
        gate=True, gate_max_dyaw_deg=3.0, gate_max_dxy=0.15,
    )
    score("cascade r=0.10 -> r=0.05", cascade["translations"],
          cascade["angles"], zeros, t1 + t3)


if __name__ == "__main__":
    main()
