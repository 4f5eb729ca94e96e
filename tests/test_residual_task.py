"""Tests for the residual-alignment task (data/residual.py): label
consistency (the transform built from rewritten labels must land the
rewritten pc1 exactly where the original transform lands the original
pc1), residual smallness, empty-cloud preservation, and the Trainer
config hook."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from alignnet3d_tpu.data.residual import (
    DEFAULTS,
    apply_residual_task,
    params_from_config,
)
from alignnet3d_tpu.geometry import (
    get_mat_angle_batch,
    transform_points,
    wrap_angle,
)


def _make_batch(rng, b=6, n=32):
    pc1 = rng.normal(size=(b, n, 3)).astype(np.float32)
    c1 = pc1.mean(axis=1)
    t = rng.normal(size=(b, 3)).astype(np.float32) * 2
    a = rng.uniform(-np.pi, np.pi, b).astype(np.float32)
    a1 = rng.uniform(-np.pi, np.pi, b).astype(np.float32)
    a2 = (a1 + a).astype(np.float32)
    T = get_mat_angle_batch(t, a, c1)
    pc2 = np.stack([
        transform_points(pc1[i], T[i]) for i in range(b)
    ]).astype(np.float32)
    c2 = pc2.mean(axis=1)
    return (pc1, pc2, t, a.reshape(b, 1), c1, c2,
            a1.reshape(b, 1), a2.reshape(b, 1))


def test_rewritten_labels_consistent():
    rng = np.random.default_rng(0)
    batch = _make_batch(rng)
    out = apply_residual_task(batch, np.random.default_rng(1), **DEFAULTS)
    pc1n, pc2n, tn, an, c1n, c2n, a1n, a2n = out
    b = len(pc1n)
    assert pc2n is batch[1] and c2n is batch[5] and a2n is batch[7]
    T_old = get_mat_angle_batch(batch[2], batch[3], batch[4])
    T_new = get_mat_angle_batch(tn, an, c1n)
    for i in range(b):
        # both transforms land their pc1 on the SAME pc2-frame points
        np.testing.assert_allclose(
            transform_points(pc1n[i], T_new[i]),
            transform_points(batch[0][i], T_old[i]),
            atol=1e-4,
        )


def test_residual_distribution_small():
    rng = np.random.default_rng(2)
    batch = _make_batch(rng, b=512)
    params = dict(DEFAULTS, outlier_prob=0.0, flip_prob=0.0)
    out = apply_residual_task(batch, np.random.default_rng(3), **params)
    an = np.asarray(out[3]).reshape(-1)
    # the new relative angle IS the sampled residual: tight around 0
    assert np.abs(np.degrees(an)).max() < 10.0
    assert np.abs(np.degrees(an)).std() < 3.0
    # pc1 is now nearly aligned with pc2: median point distance small
    d = np.linalg.norm(out[0] - batch[1], axis=-1)
    assert np.median(d) < 0.5


def test_flip_tail_present():
    rng = np.random.default_rng(4)
    batch = _make_batch(rng, b=512)
    params = dict(DEFAULTS, flip_prob=0.5)
    out = apply_residual_task(batch, np.random.default_rng(5), **params)
    an = np.asarray(out[3]).reshape(-1)
    frac_flipped = np.mean(np.abs(np.degrees(wrap_angle(an))) > 90)
    assert 0.3 < frac_flipped < 0.7


def test_empty_cloud_stays_zero():
    rng = np.random.default_rng(6)
    batch = list(_make_batch(rng, b=4))
    batch[0] = batch[0].copy()
    batch[0][2] = 0.0
    out = apply_residual_task(tuple(batch), np.random.default_rng(7),
                              **DEFAULTS)
    assert np.all(out[0][2] == 0.0)
    assert np.any(out[0][0] != 0.0)


def test_params_from_config():
    from alignnet3d_tpu.config import config_from_dict

    cfg = config_from_dict({
        "data": {"residual_task": {"enabled": True, "xy_std": 0.05}},
    })
    p = params_from_config(cfg)
    assert p["xy_std"] == 0.05
    assert p["angle_std_deg"] == DEFAULTS["angle_std_deg"]
    cfg2 = config_from_dict({"data": {}})
    assert params_from_config(cfg2) is None
