"""Error-structure breakdown for a cached eval artifact dir.

Answers "where does the residual translation error live?" by slicing the
re-based XY error (the metric's own re-base, reference evaluation.py:129)
by GT centroid distance, source point count, GT motion magnitude, and
radial-vs-tangential direction. Round-3 finding on SynthCars80k: the
NEAREST pairs (<5 m) are the worst bucket (58 % <20 cm at epoch 151 vs
~92 % at 10-20 m) despite having the most points, with isotropic error —
consistent with the 64-beam ray model's 26.9-degree vertical FOV clipping
close objects into partial views (data/synthetic.py ray model;
reference pointcloud.py:945-971).

Follow-up measurement REJECTED the FOV hypothesis: median z-extent is
1.52 m near vs 1.53 m far (no clipping). What does differ is raw point
count (median 4368 near vs 203 far): the reference's uniform
resample-with-replacement to num_points (provider.py:97-98, reproduced
here) makes the nearest, densest car panel dominate the 1024 kept
points, biasing the visible centroid differently in the two frames.
Density-normalized resampling (voxel/FPS) is the candidate fix; ICP
refinement should also preferentially repair near pairs (dense clouds).

Usage: python scripts/analyze_error_structure.py <dataset_basepath> <eval_dir>
e.g.   python scripts/analyze_error_structure.py /root/data/SynthCars80k \
           /root/data/runs/SynthCars80k/val/eval000209/refined_p2p
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    base, ed = sys.argv[1], sys.argv[2]

    from alignnet3d_tpu.data import provider
    from alignnet3d_tpu.geometry import (
        angle_diff,
        translate_transform_to_new_center_of_rotation,
    )

    val = provider.getDataFiles(f"{base}/split/val.txt")
    ds = provider.PackedDataset(base)
    rows = ds.rows(val)
    gt_t = ds.translations[rows].reshape(-1, 3)
    gt_a = ds.rel_angles[rows].reshape(-1)
    gt_c = ds.pc1centers[rows].reshape(-1, 3)
    pt = np.load(f"{ed}/pred_translations.npy")
    pa = np.load(f"{ed}/pred_angles.npy").reshape(-1)
    pc = np.load(f"{ed}/pred_s2_pc1centers.npy")

    rb = translate_transform_to_new_center_of_rotation(pt, pa, pc, gt_c)
    terr = np.linalg.norm(rb[:, :2] - gt_t[:, :2], axis=1)
    aerr = np.abs(np.degrees(angle_diff(pa, gt_a)))
    aerr180 = np.minimum(aerr, np.abs(aerr - 180.0))
    dist = np.linalg.norm(gt_c[:, :2], axis=1)
    npts = ds.counts1[rows].reshape(-1)
    tmag = np.linalg.norm(gt_t[:, :2], axis=1)

    n = len(terr)
    print(f"{ed}  n={n}")
    print("terr cm percentiles p10/p25/p50/p75/p90: "
          + "/".join(f"{v*100:.1f}" for v in np.percentile(
              terr, [10, 25, 50, 75, 90])))
    print("aerr180 deg p50/p90: "
          + "/".join(f"{v:.3f}" for v in np.percentile(aerr180, [50, 90])))

    def table(label, key, edges, fmt="{:4.0f}-{:5.0f}"):
        print(f"-- by {label}")
        for lo, hi in zip(edges[:-1], edges[1:]):
            m = (key >= lo) & (key < hi)
            if not m.sum():
                continue
            print(f"  {fmt.format(lo, hi)} n={m.sum():5d}: "
                  f"<2cm {100*np.mean(terr[m] < 0.02):4.1f}%  "
                  f"<10cm {100*np.mean(terr[m] < 0.10):4.1f}%  "
                  f"<20cm {100*np.mean(terr[m] < 0.20):4.1f}%  "
                  f"med {100*np.median(terr[m]):5.1f}cm")

    table("gt centroid distance (m)", dist, [0, 5, 10, 15, 20, 1e9])
    table("source point count", npts.astype(float),
          [0, 64, 128, 256, 512, 1e9])
    table("gt |XY translation| (m)", tmag, [0, 0.5, 1, 2, 1e9],
          fmt="{:4.1f}-{:5.1f}")

    # error direction relative to the sensor ray (radial vs tangential)
    u = gt_c[:, :2] / np.maximum(dist[:, None], 1e-9)
    evec = rb[:, :2] - gt_t[:, :2]
    rad = np.abs(np.sum(evec * u, axis=1))
    tan = np.sqrt(np.maximum(np.sum(evec**2, axis=1) - rad**2, 0))
    for label, m in (("near (<5m)", dist < 5), ("far (>=5m)", dist >= 5)):
        if m.sum():
            print(f"{label}: med radial {100*np.median(rad[m]):.1f} cm, "
                  f"med tangential {100*np.median(tan[m]):.1f} cm")


if __name__ == "__main__":
    main()
