"""Angle bin/residual codec round-trip + decode-path parity tests
(reference models/tp8.py:181-301)."""

import jax.numpy as jnp
import numpy as np
import pytest

from alignnet3d_tpu.ops import angle_codec as ac


@pytest.mark.parametrize("num_bins", [36, 50])
def test_angle2class_roundtrip(num_bins):
    angles = jnp.asarray(np.linspace(-np.pi, np.pi, 101))
    cls, res = ac.angle2class(angles, num_bins)
    recon = ac.class2angle(cls, res, num_bins)
    diff = np.mod(np.asarray(recon) - np.asarray(angles) + np.pi, 2 * np.pi) - np.pi
    assert np.max(np.abs(diff)) < 1e-5


def test_angle2class_bin_centers():
    num_bins = 36
    apc = 2 * np.pi / num_bins
    cls, res = ac.angle2class(jnp.asarray([0.0, apc, 2 * apc]), num_bins)
    assert list(np.asarray(cls)) == [0, 1, 2]
    assert np.allclose(np.asarray(res), 0.0, atol=1e-6)


def test_residual_range():
    num_bins = 50
    angles = jnp.asarray(np.random.default_rng(0).uniform(-10, 10, 1000))
    _, res = ac.angle2class(angles, num_bins)
    assert np.all(np.abs(np.asarray(res)) <= np.pi / num_bins + 1e-6)


def test_logits_to_angle_gathers_argmax_residual():
    num_bins = 4
    logits = np.zeros((2, 8), dtype=np.float32)
    logits[0, 1] = 5.0  # class 1
    logits[0, 4:] = [9.0, 0.25, 9.0, 9.0]  # residual of class 1 = 0.25
    logits[1, 3] = 5.0  # class 3
    logits[1, 4:] = [9.0, 9.0, 9.0, -0.5]
    out = np.asarray(
        ac.logits_to_angle(jnp.asarray(logits), num_bins, residual_scale=1.0)
    )
    apc = 2 * np.pi / num_bins
    assert out[0] == pytest.approx(1 * apc + 0.25, abs=1e-6)
    # class 3 center = 3*apc > pi -> wrapped to label format
    expected = 3 * apc - 0.5
    expected = (expected + np.pi) % (2 * np.pi) - np.pi
    assert out[1] == pytest.approx(expected, abs=1e-6)


def test_np_decoder_matches_jax_decoder_when_scaled():
    num_bins = 50
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(32, 2 * num_bins)).astype(np.float32)
    scale = np.pi / num_bins
    jax_out = np.asarray(
        ac.logits_to_angle(jnp.asarray(logits), num_bins, residual_scale=scale)
    )
    np_out = ac.class_logits_to_angle_np(logits, num_bins, residual_scale=scale)
    # label-format wrap differs only at exactly +pi; compare wrapped
    d = np.mod(jax_out - np_out + np.pi, 2 * np.pi) - np.pi
    assert np.max(np.abs(d)) < 1e-5


def test_np_decoder_default_keeps_reference_unscaled_quirk():
    """Eval decodes residuals UNSCALED (reference tp8.py:241-244)."""
    num_bins = 4
    logits = np.zeros((1, 8), dtype=np.float32)
    logits[0, 0] = 5.0
    logits[0, 4] = 0.8  # raw head output
    out = ac.class_logits_to_angle_np(logits, num_bins)
    assert out[0] == pytest.approx(0.8, abs=1e-6)  # used as radians directly


def test_soft_angle_targets_sum_to_one_and_peak():
    num_bins = 36
    targets = jnp.asarray([5.0, 95.0, 355.0])
    dist = np.asarray(ac.soft_angle_targets(targets, num_bins, 5.0))
    assert dist.shape == (3, num_bins)
    assert np.allclose(dist.sum(axis=1), 1.0, atol=1e-3)
    assert np.argmax(dist[0]) == 0  # 5 deg is mid-bin-0 ([0, 10) deg)
    assert np.argmax(dist[1]) == 9  # 95 deg is mid-bin-9
    # wrap-around: 355 deg peaks in the last bin but leaks into bin 0
    assert np.argmax(dist[2]) == num_bins - 1 or np.argmax(dist[2]) == 0
    assert dist[2, 0] > 1e-4


def test_jax_angle_diff():
    a = jnp.asarray([0.1, np.pi - 0.1])
    b = jnp.asarray([-0.1, -np.pi + 0.1])
    d = np.asarray(ac.jax_angle_diff(a, b))
    assert d[0] == pytest.approx(-0.2, abs=1e-6)
    assert d[1] == pytest.approx(0.2, abs=1e-6)
