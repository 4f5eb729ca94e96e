"""Interpret-mode equivalence of the fused edge-conv stage
(ops/edge_conv_kernels.py) vs the XLA reference graph
(get_edge_feature + dense chain + max over k). On-chip validation runs
in scripts/onchip_smoke.py per the round-4 process rule."""

import jax.numpy as jnp
import numpy as np
import pytest

from alignnet3d_tpu.ops.edge_conv_kernels import fused_edge_stage
from alignnet3d_tpu.ops.knn import get_edge_feature, knn, pairwise_distance


def _reference(points, nn_idx, w1, b1, w2, b2):
    e = get_edge_feature(points, nn_idx)              # (B, N, k, 2C)
    h = jnp.maximum(e @ w1 + b1, 0.0)
    h = jnp.maximum(h @ w2 + b2, 0.0)
    return jnp.max(h, axis=2)


@pytest.mark.parametrize("b,n,k", [(2, 128, 8), (1, 200, 20), (3, 256, 5)])
def test_fused_edge_stage_matches_xla(b, n, k):
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(size=(b, n, 3)), jnp.float32)
    idx = knn(pairwise_distance(pts), k)
    w1 = jnp.asarray(rng.normal(size=(6, 64)) / 2.0, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(64,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(64, 128)) / 8.0, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(128,)) * 0.1, jnp.float32)
    want = np.asarray(_reference(pts, idx, w1, b1, w2, b2))
    got = np.asarray(fused_edge_stage(pts, idx, w1, b1, w2, b2))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_fused_edge_stage_wide_features():
    # embedding-stage shape: C=3 is not special-cased
    rng = np.random.default_rng(1)
    b, n, k, c = 2, 160, 10, 3
    pts = jnp.asarray(rng.normal(size=(b, n, c)), jnp.float32)
    idx = knn(pairwise_distance(pts), k)
    w1 = jnp.asarray(rng.normal(size=(2 * c, 64)) / 2.0, jnp.float32)
    b1 = jnp.zeros((64,), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(64, 256)) / 8.0, jnp.float32)
    b2 = jnp.zeros((256,), jnp.float32)
    want = np.asarray(_reference(pts, idx, w1, b1, w2, b2))
    got = np.asarray(fused_edge_stage(pts, idx, w1, b1, w2, b2))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
