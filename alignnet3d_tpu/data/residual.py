"""Residual-alignment training task: pre-align pc1 by the ground truth
composed with a small sampled residual, so the model trains on the
NEAR-IDENTITY transform distribution a refinement pass actually sees.

Framework addition (no reference analogue — the reference's only
refinement is Open3D ICP, train.py:461-484). Motivation: the flagship's
coarse pass leaves residuals of a few cm / <2 deg, a regime that is a
vanishing fraction of the uniform pose distribution it was trained on
(data/synthetic.py RandomTransform). A model fine-tuned on the residual
distribution becomes a learned fine-aligner: at serving time the coarse
model runs first, its transform is applied to pc1, and this refiner
predicts the remaining correction (scripts/probe_iter_refine.py
--refiner; the compositions are exact rigid 4x4 products).

Label rewrite: for a sampled residual dT (yaw ``da`` about the TARGET
object center c2, then translation ``dt``), pc1 is transformed by
M = dT^-1 @ T_gt so the new true relative transform is exactly dT:
T' = T_gt @ M^-1 = dT. The six label arrays are rewritten consistently
(pc1 center/angle move with M; translation is re-based to the moved
center c1' = M c1, the reference's label convention: rotation about the
frame-1 object center, pointcloud.py:888-906).

Sampling: gaussian core (angle_std_deg, xy_std, z_std) matching the
coarse model's empirical error scale, an outlier tail (outlier_prob,
outlier_angle_deg, outlier_xy) so bad coarse inits stay in
distribution, and a flip tail (flip_prob: da += pi) so the refiner can
repair unresolved 180-degree flips.

Config: ``data.residual_task`` with keys enabled/angle_std_deg/xy_std/
z_std/outlier_prob/outlier_angle_deg/outlier_xy/flip_prob (all optional
but ``enabled``). Applied in Trainer._make_batch to train AND eval
batches, so epoch metrics track the residual task itself; end-to-end
two-stage accuracy is measured by scripts/probe_iter_refine.py.
"""

from __future__ import annotations

import numpy as np

from alignnet3d_tpu.geometry import (
    get_mat_angle_batch,
    invert_rigid_batch,
    rotation_matrix_z,
)

DEFAULTS = dict(
    angle_std_deg=1.5,
    xy_std=0.08,
    z_std=0.02,
    outlier_prob=0.15,
    outlier_angle_deg=10.0,
    outlier_xy=0.4,
    flip_prob=0.1,
)


def params_from_config(cfg) -> dict | None:
    """Extract residual-task params from a config, or None if disabled."""
    if not (cfg.data.has("residual_task")
            and cfg.data.residual_task.enabled):
        return None
    rt = cfg.data.residual_task
    return {k: (getattr(rt, k) if rt.has(k) else v)
            for k, v in DEFAULTS.items()}


def apply_residual_task(batch, rng: np.random.Generator, *,
                        angle_std_deg: float, xy_std: float, z_std: float,
                        outlier_prob: float, outlier_angle_deg: float,
                        outlier_xy: float, flip_prob: float):
    """Rewrite a provider batch into the residual-alignment task.

    ``batch`` is the 8-tuple from PackedDataset.sample_batch:
    (pc1, pc2, translation, rel_angle, pc1center, pc2center,
    pc1angle, pc2angle). Returns a tuple of the same shapes; pc2 and its
    labels are untouched. Empty pc1 clouds (all-zero, reference
    provider.py:95-96 semantics) stay zero.
    """
    pc1, pc2, t, a, c1, c2, a1, a2 = batch
    b = len(pc1)
    t = np.asarray(t, np.float64).reshape(b, 3)
    a = np.asarray(a, np.float64).reshape(b)
    c1 = np.asarray(c1, np.float64).reshape(b, 3)
    c2 = np.asarray(c2, np.float64).reshape(b, 3)

    # residual sample: gaussian core + outlier tail + flip tail
    da = rng.normal(0.0, np.radians(angle_std_deg), b)
    dt = rng.normal(0.0, 1.0, (b, 3)) * np.array([xy_std, xy_std, z_std])
    is_out = rng.random(b) < outlier_prob
    da_out = rng.normal(0.0, np.radians(outlier_angle_deg), b)
    dt_out = rng.normal(0.0, 1.0, (b, 3)) * np.array(
        [outlier_xy, outlier_xy, z_std]
    )
    da = np.where(is_out, da_out, da)
    dt = np.where(is_out[:, None], dt_out, dt)
    da = da + (rng.random(b) < flip_prob) * np.pi

    # dT: yaw da about the target center c2, then translate dt
    dT = get_mat_angle_batch(dt, da, c2)
    T_gt = get_mat_angle_batch(t, a, c1)
    M = np.einsum("nij,njk->nik", invert_rigid_batch(dT), T_gt)

    R = M[:, :3, :3]
    new_pc1 = (
        np.einsum("nij,nkj->nki", R, np.asarray(pc1, np.float64))
        + M[:, None, :3, 3]
    )
    empty = ~np.any(np.asarray(pc1) != 0.0, axis=(1, 2))
    new_pc1[empty] = 0.0

    yaw_M = np.arctan2(M[:, 1, 0], M[:, 0, 0])
    new_c1 = np.einsum("nij,nj->ni", R, c1) + M[:, :3, 3]
    new_a1 = np.asarray(a1, np.float64).reshape(b) + yaw_M
    # translation label re-based to the moved center: T' = dT, so
    # t' = dT[:3,3] - (c1' - Rz(da) c1')
    Rda = rotation_matrix_z(da)
    new_t = dT[:, :3, 3] - new_c1 + np.einsum("nij,nj->ni", Rda, new_c1)

    f32 = np.float32
    return (
        np.ascontiguousarray(new_pc1, f32), pc2,
        new_t.astype(f32),
        da.astype(f32).reshape(np.shape(batch[3])),
        new_c1.astype(f32),
        batch[5],
        new_a1.astype(f32).reshape(np.shape(batch[6])),
        batch[7],
    )
