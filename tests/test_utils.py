"""PLY IO, Euler conversions, point-cloud render/volume utilities."""

import numpy as np
import pytest

from alignnet3d_tpu.utils import euler, pc_util, ply


def test_ply_ascii_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(40, 3)).astype(np.float32)
    path = str(tmp_path / "a.ply")
    ply.write_ply(pts, path, text=True)
    back = ply.read_ply_xyz(path)
    np.testing.assert_allclose(back, pts, atol=1e-6)


def test_ply_binary_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(64, 3)).astype(np.float32)
    path = str(tmp_path / "b.ply")
    ply.write_ply(pts, path, text=False)
    back = ply.read_ply_xyz(path)
    np.testing.assert_allclose(back, pts, atol=1e-7)


def test_ply_extra_props(tmp_path, rng):
    pts = rng.normal(size=(10, 3)).astype(np.float32)
    colors = (rng.random(10) * 255).astype(np.uint8)
    path = str(tmp_path / "c.ply")
    ply.write_ply(pts, path, text=False, extra_props={"red": colors})
    data = ply.read_ply(path)
    np.testing.assert_array_equal(data["vertex"]["red"], colors)


def test_euler_mat_roundtrip():
    for z, y, x in [(0.3, -0.2, 0.5), (1.2, 0.0, -0.7), (0.0, 0.0, 0.0)]:
        M = euler.euler2mat(z, y, x)
        assert np.allclose(M @ M.T, np.eye(3), atol=1e-12)
        z2, y2, x2 = euler.mat2euler(M)
        M2 = euler.euler2mat(z2, y2, x2)
        np.testing.assert_allclose(M, M2, atol=1e-12)


def test_euler_quat_consistency():
    z, y, x = 0.4, -0.3, 0.8
    q = euler.euler2quat(z, y, x)
    assert np.linalg.norm(q) == pytest.approx(1.0)
    np.testing.assert_allclose(
        euler.quat2mat(q), euler.euler2mat(z, y, x), atol=1e-12
    )
    z2, y2, x2 = euler.quat2euler(q)
    np.testing.assert_allclose(
        euler.euler2mat(z2, y2, x2), euler.euler2mat(z, y, x), atol=1e-12
    )


def test_angle_axis_roundtrip():
    theta, vec = euler.euler2angle_axis(0.5, 0.2, -0.1)
    z, y, x = euler.angle_axis2euler(theta, vec, is_normalized=True)
    np.testing.assert_allclose(
        euler.euler2mat(z, y, x), euler.euler2mat(0.5, 0.2, -0.1), atol=1e-9
    )


def test_volume_roundtrip():
    pts = np.array([[0.0, 0.0, 0.0], [0.5, 0.5, 0.5], [-0.9, 0.2, 0.1]])
    vol = pc_util.point_cloud_to_volume(pts, vsize=12, radius=1.0)
    assert vol.shape == (12, 12, 12)
    assert vol.sum() == 3
    back = pc_util.volume_to_point_cloud(vol)
    assert back.shape == (3, 3)
    batch = pc_util.point_cloud_to_volume_batch([pts, pts], vsize=8)
    assert batch.shape == (2, 8 * 8 * 8)


def test_draw_point_cloud(rng):
    pts = rng.normal(size=(200, 3))
    img = pc_util.draw_point_cloud(pts)
    assert img.shape == (500, 500)
    assert img.max() == pytest.approx(1.0)
    assert img.min() >= 0.0
    three = pc_util.point_cloud_three_views(pts)
    assert three.shape == (500, 1500)
    # empty cloud renders an empty canvas
    empty = pc_util.draw_point_cloud(np.zeros((0, 3)))
    assert empty.sum() == 0
