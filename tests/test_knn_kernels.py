"""Fused Pallas k-NN kernel vs the XLA reference path (ops/knn.py):
exact index equality including tie ordering, padding, and odd sizes.
Runs in interpret mode on the CPU mesh."""

import numpy as np
import pytest
import jax.numpy as jnp

from alignnet3d_tpu.ops.knn import knn, pairwise_distance
from alignnet3d_tpu.ops.knn_kernels import knn_points_pallas


@pytest.mark.parametrize("b,n,k", [(2, 128, 20), (3, 200, 8), (1, 256, 1)])
def test_knn_kernel_matches_xla(b, n, k):
    rng = np.random.default_rng(7 + n)
    pts = jnp.asarray(rng.normal(size=(b, n, 3)), jnp.float32)
    ref = np.asarray(knn(pairwise_distance(pts), k))
    got = np.asarray(knn_points_pallas(pts, k, interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_knn_kernel_self_first_and_ties():
    # duplicate points force distance ties; ordering must match top_k
    # (ascending distance, lower index first), self at rank 0
    pts = np.zeros((1, 132, 3), np.float32)
    pts[0, :, 0] = np.repeat(np.arange(66, dtype=np.float32), 2)
    pts = jnp.asarray(pts)
    k = 6
    ref = np.asarray(knn(pairwise_distance(pts), k))
    got = np.asarray(knn_points_pallas(pts, k, interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_knn_kernel_small_tile_override():
    rng = np.random.default_rng(3)
    pts = jnp.asarray(rng.normal(size=(2, 384, 3)), jnp.float32)
    ref = np.asarray(knn(pairwise_distance(pts), 10))
    got = np.asarray(knn_points_pallas(pts, 10, tm=128, interpret=True))
    np.testing.assert_array_equal(got, ref)
