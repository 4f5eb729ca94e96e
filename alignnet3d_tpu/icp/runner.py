"""Standalone ICP evaluation driver — the L7 equivalent of reference
icp.py:150-213 (invoked for configs with evaluation.special.mode == 'icp').

Variants (reference make_icp_configs.py:6-26):
- ``p2point``: centroid-difference init + constrained p2point ICP,
  radius 0.10 (reference icp.py:184-185, 69-78);
- ``o3_gicp``: FPFH features + parallel-hypothesis RANSAC (reference
  icp.py:85-105), fully batched over pairs (icp/fpfh.py);
- ``o3_gicp_fast``: FPFH features + Fast Global Registration —
  graduated non-convexity over the Geman-McClure penalty, constrained
  variant included (reference icp.py:121-143; icp/fgr.py);
- ``multistart`` (framework addition): the 1-DoF rotation space
  enumerated directly — parallel yaw multi-start with coarse-to-fine
  constrained ICP (icp/p2point.py:multistart_global_registration);
- ``*_p2p`` refinement variants reuse the precomputed global-registration
  outputs and add their stored mean_time to the budget
  (reference icp.py:160-170).

Artifacts match the reference: pred_translations/pred_angles/
pred_s1_pc1centers npys + eval.json/eval_180.json; ICP outputs are
world-frame so the rotation center is the origin (icp.py:196-198).
"""

from __future__ import annotations

import json
import logging
import os
import time

import numpy as np

from alignnet3d_tpu.data import provider
from alignnet3d_tpu.evaluation import metrics as evaluation
from alignnet3d_tpu.geometry import get_mat_angle
from alignnet3d_tpu.icp.p2point import (
    icp_p2point_batch,
    multistart_global_registration,
    pad_full_clouds,
)

logger = logging.getLogger("alignnet3d_tpu")


def evaluate(cfg, use_old_results: bool = False, pair_chunk: int = 128,
             max_points: int = 4096):
    val_idxs = provider.getDataFiles(f"{cfg.data.basepath}/split/val.txt")
    dataset = provider.PackedDataset(cfg.data.basepath)

    epoch = 0
    total_time = 0.0
    icp_cfg = cfg.evaluation.special.icp
    variant = icp_cfg.variant
    with_constraint = icp_cfg.with_constraint
    do_refinement = icp_cfg.has("refine")
    refinement_method = icp_cfg.refine if do_refinement else None

    precomp = None
    if variant in ("o3_gicp", "o3_gicp_fast") and do_refinement:
        gicp_result_dir = (
            f"{cfg.logging.logdir[:-4]}/val/eval{str(epoch).zfill(6)}"
        )
        assert os.path.isdir(gicp_result_dir), gicp_result_dir
        eval_json = f"{gicp_result_dir}/eval_180.json"
        assert os.path.isfile(eval_json), eval_json
        eval_dict = json.load(open(eval_json))
        total_time += eval_dict["mean_time"] * float(len(val_idxs))
        precomp = (
            np.load(f"{gicp_result_dir}/pred_translations.npy"),
            np.load(f"{gicp_result_dir}/pred_angles.npy"),
            np.load(f"{gicp_result_dir}/pred_s1_pc1centers.npy"),
        )
        logger.info("Precomputed results loaded")

    rows = dataset.rows(val_idxs)
    # one padded length for the whole set -> one compiled ICP executable
    global_pad = max(1, min(max_points, int(max(
        dataset.counts1[rows].max(initial=1),
        dataset.counts2[rows].max(initial=1),
    ))))
    all_gt_translations = dataset.translations[rows]
    all_gt_angles = dataset.rel_angles[rows]
    all_gt_pc1centers = dataset.pc1centers[rows]

    eval_dir = f"{cfg.logging.logdir}/val/eval{str(epoch).zfill(6)}"
    n = len(val_idxs)
    if use_old_results and os.path.isfile(f"{eval_dir}/pred_translations.npy"):
        all_pred_translations = np.load(f"{eval_dir}/pred_translations.npy")
        all_pred_angles = np.load(f"{eval_dir}/pred_angles.npy")
        all_pred_centers = np.load(f"{eval_dir}/pred_s1_pc1centers.npy")
    else:
        all_pred_translations = np.empty((n, 3), np.float32)
        all_pred_angles = np.empty((n, 1), np.float32)
        all_pred_centers = np.zeros((n, 3), np.float32)

        for s in range(0, n, pair_chunk):
            e = min(s + pair_chunk, n)
            (src, sm), (dst, dm) = pad_full_clouds(
                dataset, val_idxs[s:e], max_points=max_points,
                pad_to=global_pad,
            )
            t0 = time.time()
            if variant == "p2point":
                # centroid-difference init (icp.py:62-66, 74)
                c1 = (src * sm[..., None]).sum(1) / np.maximum(
                    sm.sum(1)[:, None], 1
                )
                c2 = (dst * dm[..., None]).sum(1) / np.maximum(
                    dm.sum(1)[:, None], 1
                )
                init = np.tile(np.eye(4), (e - s, 1, 1))
                init[:, :3, 3] = c2 - c1
                tf, fit, rmse = icp_p2point_batch(
                    src, sm, dst, dm, init, radius=0.10, its=30,
                    with_constraint=with_constraint,
                )
            elif variant in ("o3_gicp", "o3_gicp_fast"):
                if precomp is not None:
                    init = np.stack([
                        get_mat_angle(precomp[0][i], precomp[1][i], precomp[2][i])
                        for i in range(s, e)
                    ])
                    tf, fit, rmse = icp_p2point_batch(
                        src, sm, dst, dm, init, radius=0.10, its=30,
                        with_constraint=with_constraint,
                    )
                else:
                    # o3_gicp: FPFH + parallel-hypothesis RANSAC
                    # (reference icp_o3_gicp, icp.py:85-105);
                    # o3_gicp_fast: FPFH + Fast Global Registration
                    # (reference icp_o3_gicp_fast, icp.py:121-143;
                    # icp/fgr.py). Both fully batched — one set of
                    # device launches per chunk, no per-pair loop.
                    from alignnet3d_tpu.icp.fpfh import (
                        global_registration_batch,
                    )

                    method = "ransac" if variant == "o3_gicp" else "fgr"
                    voxel = (
                        icp_cfg.voxel_size
                        if icp_cfg.has("voxel_size") else 0.05
                    )
                    # framework tuning knobs (VERDICT r2 item 4): RANSAC
                    # hypothesis count + reciprocal-match pruning
                    extra = {}
                    if method == "ransac":
                        if icp_cfg.has("num_hypotheses"):
                            extra["num_hypotheses"] = int(
                                icp_cfg.num_hypotheses
                            )
                        if icp_cfg.has("mutual_filter"):
                            extra["mutual_filter"] = bool(
                                icp_cfg.mutual_filter
                            )
                    tf, fit, rmse = global_registration_batch(
                        src, sm, dst, dm, voxel_size=voxel, seed=s,
                        method=method, with_constraint=with_constraint,
                        **extra,
                    )
            elif variant == "multistart":
                # framework addition: initialization-free yaw multi-start
                # (enumerate the 1-DoF rotation space; round-1 baseline)
                tf, fit, rmse = multistart_global_registration(
                    src, sm, dst, dm, num_yaw_hypotheses=8
                )
            else:
                raise AssertionError(f"unimplemented ICP variant {variant!r}")
            total_time += time.time() - t0
            all_pred_translations[s:e] = tf[:, :3, 3]
            all_pred_angles[s:e, 0] = np.arctan2(tf[:, 1, 0], tf[:, 0, 0])

        os.makedirs(eval_dir, exist_ok=True)
        np.save(f"{eval_dir}/pred_translations.npy", all_pred_translations)
        np.save(f"{eval_dir}/pred_angles.npy", all_pred_angles)
        np.save(f"{eval_dir}/pred_s1_pc1centers.npy", all_pred_centers)

    metas = dataset.metas(val_idxs)
    for accept_inverted_angle in (False, True):
        eval_dict = evaluation.evaluate(
            cfg, val_idxs, all_pred_translations, all_pred_angles,
            all_gt_translations, all_gt_angles, all_pred_centers,
            all_gt_pc1centers, eval_dir=eval_dir,
            accept_inverted_angle=accept_inverted_angle,
            mean_time=total_time / max(1, n), metas=metas,
        )
        logger.info(evaluation.ns_to_dict(eval_dict))
    return eval_dict
