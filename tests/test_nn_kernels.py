"""Fused Pallas NN-argmin kernel vs the XLA reference formula (runs in
interpreter mode on the CPU mesh; the TPU path is exercised by
icp/p2point.py routing on real hardware)."""

import numpy as np
import jax
import jax.numpy as jnp

from alignnet3d_tpu.ops.nn_kernels import nn_argmin_pallas


def _reference(src, dst, mask):
    d2 = (
        np.sum(src ** 2, 1)[:, None]
        - 2.0 * src @ dst.T
        + np.sum(dst ** 2, 1)[None, :]
    )
    d2 = np.maximum(d2, 0.0)
    d2[:, ~mask] = np.inf
    idx = np.argmin(d2, 1)
    return idx, d2[np.arange(len(src)), idx]


def test_matches_reference_various_shapes(rng):
    for n1, n2, nv in [(16, 40, 33), (130, 700, 650), (1025, 1300, 1300)]:
        src = rng.normal(size=(n1, 3)).astype(np.float32)
        dst = rng.normal(size=(n2, 3)).astype(np.float32)
        mask = np.zeros(n2, bool)
        mask[:nv] = True
        gi, gd = _reference(src, dst, mask)
        i, d = nn_argmin_pallas(
            jnp.asarray(src), jnp.asarray(dst), jnp.asarray(mask)
        )
        np.testing.assert_array_equal(np.asarray(i), gi)
        np.testing.assert_allclose(np.asarray(d), gd, rtol=1e-4, atol=1e-5)


def test_vmaps_over_pairs(rng):
    src = rng.normal(size=(3, 256, 3)).astype(np.float32)
    dst = rng.normal(size=(3, 256, 3)).astype(np.float32)
    mask = np.ones((3, 256), bool)
    i, d = jax.vmap(nn_argmin_pallas)(
        jnp.asarray(src), jnp.asarray(dst), jnp.asarray(mask)
    )
    for b in range(3):
        gi, gd = _reference(src[b], dst[b], mask[b])
        np.testing.assert_array_equal(np.asarray(i[b]), gi)
