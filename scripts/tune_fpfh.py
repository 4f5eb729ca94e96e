"""Per-dataset FPFH voxel-size sweep (VERDICT round-1 item 5).

The reference hardwires voxel_size=0.05 (icp.py:88); on sparse long-range
LiDAR (4-8 cm point spacing at 10-20 m) that leaves FPFH with no
neighborhood to describe. This sweeps voxel sizes for both global-
registration methods on a val subset and prints the <20 cm / yaw<10 deg
(180-accepted) success rates, so each dataset config can pin
``evaluation.special.icp.voxel_size``.

Usage: python scripts/tune_fpfh.py <dataset_basepath> [n_pairs]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    basepath = sys.argv[1]
    n_pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    from alignnet3d_tpu.data import provider
    from alignnet3d_tpu.geometry import (
        angle_diff,
        translate_transform_to_new_center_of_rotation,
    )
    from alignnet3d_tpu.icp.fpfh import global_registration_batch
    from alignnet3d_tpu.icp.p2point import pad_full_clouds

    val = provider.getDataFiles(f"{basepath}/split/val.txt")[:n_pairs]
    ds = provider.PackedDataset(basepath)
    rows = ds.rows(val)
    gt_t = ds.translations[rows].reshape(-1, 3)
    gt_a = ds.rel_angles[rows].reshape(-1)
    gt_c = ds.pc1centers[rows].reshape(-1, 3)
    (src, sm), (dst, dm) = pad_full_clouds(ds, val, max_points=4096)

    for method in ("ransac", "fgr"):
        for voxel in (0.05, 0.10, 0.15, 0.25, 0.35, 0.5):
            tf, fit, rmse = global_registration_batch(
                src, sm, dst, dm, voxel_size=voxel, method=method,
            )
            pa = np.arctan2(tf[:, 1, 0], tf[:, 0, 0])
            # the estimated transform is world-frame (rotation about the
            # origin); re-base to the GT rotation center before scoring,
            # exactly like the metric (evaluation.py:129)
            pt = translate_transform_to_new_center_of_rotation(
                tf[:, :3, 3], pa, np.zeros_like(gt_c), gt_c
            )
            terr = np.linalg.norm(pt[:, :2] - gt_t[:, :2], axis=1)
            aerr = np.abs(np.degrees(angle_diff(pa, gt_a)))
            aerr = np.minimum(aerr, np.abs(aerr - 180.0))  # 180-accepted
            ok_t = float(np.mean(terr < 0.2))
            ok_a = float(np.mean(aerr < 10.0))
            both = float(np.mean((terr < 0.2) & (aerr < 10.0)))
            print(f"{method:6s} voxel={voxel:.2f}: <20cm {ok_t:.3f} "
                  f"yaw<10 {ok_a:.3f} both {both:.3f} "
                  f"fit {float(np.mean(fit)):.3f}", flush=True)


if __name__ == "__main__":
    main()
