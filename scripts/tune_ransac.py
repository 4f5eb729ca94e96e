"""RANSAC hypothesis-count x mutual-filter sweep (VERDICT r2 item 4).

The reference's o3_gicp burns 4M sequential RANSAC iterations with
500-validation early exit (reference icp.py:101); the batched rebuild
evaluates K parallel hypotheses. Round 2's K=2048 with an unpruned
correspondence set underperformed its siblings (18.9% <20cm vs FGR's
28.6%). This sweeps K in {2048..16384} with and without the reciprocal
(mutual) correspondence filter on a val subset, scoring VAL and TEST
(idx>=1000) separately so the pick is made on val and reported on the
holdout.

Usage: python scripts/tune_ransac.py <dataset_basepath> [n_pairs] [voxel]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    basepath = sys.argv[1]
    n_pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    voxel = float(sys.argv[3]) if len(sys.argv) > 3 else 0.35

    from alignnet3d_tpu.data import provider
    from alignnet3d_tpu.evaluation.quickscore import (
        format_table,
        positional_is_test,
        success_table,
    )
    from alignnet3d_tpu.icp.fpfh import global_registration_batch
    from alignnet3d_tpu.icp.p2point import pad_full_clouds

    full_val = provider.getDataFiles(f"{basepath}/split/val.txt")
    # POSITIONAL val/test rule (metrics._is_test): positions >= 1000 are
    # the holdout. Sample HALF the pair budget from each side so the
    # test columns are populated even at small n_pairs (taking the first
    # n_pairs positions would leave the holdout empty for n_pairs<=1000)
    full_is_test = positional_is_test(len(full_val))
    half = max(1, n_pairs // 2)
    positions = np.concatenate([
        np.flatnonzero(~full_is_test)[:half],
        np.flatnonzero(full_is_test)[:half],
    ])
    val = [full_val[p] for p in positions]
    is_test = full_is_test[positions]
    ds = provider.PackedDataset(basepath)
    rows = ds.rows(val)
    gt_t = ds.translations[rows].reshape(-1, 3)
    gt_a = ds.rel_angles[rows].reshape(-1)
    gt_c = ds.pc1centers[rows].reshape(-1, 3)
    (src, sm), (dst, dm) = pad_full_clouds(ds, val, max_points=4096)

    # Chunk pairs like icp/runner.py (pair_chunk=128): the FPFH neighbor
    # gather is (B, N, k, 33) and blows HBM at B=512 in one launch
    # (observed: 17.7 GB alloc). Hypothesis memory is bounded separately
    # by the lax.map chunking inside ransac_registration.
    pair_chunk = 128
    n_total = len(src)
    for mutual in (False, True):
        for k in (2048, 4096, 8192, 16384):
            t0 = time.time()
            parts = []
            for s0 in range(0, n_total, pair_chunk):
                e0 = min(s0 + pair_chunk, n_total)
                parts.append(global_registration_batch(
                    src[s0:e0], sm[s0:e0], dst[s0:e0], dm[s0:e0],
                    voxel_size=voxel, method="ransac",
                    num_hypotheses=k, mutual_filter=mutual,
                )[0])
            tf = np.concatenate(parts, axis=0)
            dt = time.time() - t0
            pa = np.arctan2(tf[:, 1, 0], tf[:, 0, 0])
            tab = success_table(tf[:, :3, 3], pa, np.zeros_like(gt_c),
                                gt_t, gt_a, gt_c, is_test)
            print(
                f"mutual={int(mutual)} K={k:5d}: {format_table(tab)}"
                f"  ({dt:.1f}s)",
                flush=True,
            )


if __name__ == "__main__":
    main()
