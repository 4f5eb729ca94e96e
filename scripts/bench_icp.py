#!/usr/bin/env python
"""Secondary benchmark: batched on-device ICP throughput.

Reports pairs/s for the constrained point-to-point ICP at a given cloud
size and iteration count — the workload the reference runs as ~per-sample
100ms C++ calls (icp.py:75-77). Not part of bench.py's single JSON line;
run manually for RESULTS.md numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main(batch: int = 256, n_points: int = 1024, its: int = 30):
    from alignnet3d_tpu.geometry import get_mat_angle, transform_points
    from alignnet3d_tpu.icp.p2point import icp_p2point_batch

    rng = np.random.default_rng(0)
    src = rng.normal(size=(batch, n_points, 3)).astype(np.float32)
    src[..., :2] *= 2.0
    mask = np.ones((batch, n_points), bool)
    dst = np.stack([
        transform_points(
            src[i], get_mat_angle(rng.uniform(-0.3, 0.3, 3),
                                  rng.uniform(-0.2, 0.2))
        )
        for i in range(batch)
    ]).astype(np.float32)
    init = np.tile(np.eye(4), (batch, 1, 1))

    # warmup/compile
    icp_p2point_batch(src, mask, dst, mask, init, radius=0.5, its=its)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        tf, fit, rmse = icp_p2point_batch(
            src, mask, dst, mask, init, radius=0.5, its=its
        )
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({
        "metric": "icp_pairs_per_sec",
        "value": round(batch / best, 1),
        "unit": "pairs/s",
        "batch": batch, "n_points": n_points, "iterations": its,
        "mean_fitness": round(float(fit.mean()), 3),
    }))


if __name__ == "__main__":
    main()
