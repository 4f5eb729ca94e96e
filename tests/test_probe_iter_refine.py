"""Tests for scripts/probe_iter_refine.py helpers: the vectorized
transform builder must match geometry.get_mat_angle, and composing an
exact residual onto a perturbed init must recover the ground truth."""

import importlib.util
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from alignnet3d_tpu.geometry import get_mat_angle, transform_points

spec = importlib.util.spec_from_file_location(
    "probe_iter_refine",
    os.path.join(os.path.dirname(__file__), "..", "scripts",
                 "probe_iter_refine.py"),
)
probe = importlib.util.module_from_spec(spec)
spec.loader.exec_module(probe)


def test_mats_from_matches_get_mat_angle():
    rng = np.random.default_rng(0)
    t = rng.normal(size=(16, 3))
    a = rng.uniform(-np.pi, np.pi, 16)
    c = rng.normal(size=(16, 3)) * 5
    M = probe._mats_from(t, a, c)
    for i in range(16):
        expect = get_mat_angle(t[i], a[i], c[i])
        np.testing.assert_allclose(M[i], expect, atol=1e-12)


def test_residual_composition_recovers_gt():
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(64, 3)).astype(np.float64)
    gt = get_mat_angle([1.0, -2.0, 0.3], 0.9, [4.0, 1.0, 0.0])
    # imperfect first pass
    M1 = get_mat_angle([0.9, -1.8, 0.25], 0.8, [4.0, 1.0, 0.0])
    # exact second pass measured on M1-transformed points
    dM = gt @ np.linalg.inv(M1)
    M = np.einsum("ij,jk->ik", dM, M1)
    np.testing.assert_allclose(
        transform_points(pts, M), transform_points(pts, gt), atol=1e-9
    )
