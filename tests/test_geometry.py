"""Unit tests for the pure geometry module against hand-computed values and
reference semantics (reference tp_utils/pointcloud.py:247-318)."""

import numpy as np
import pytest

from alignnet3d_tpu import geometry as geo


def test_np_str_roundtrip():
    arr = np.array([1.5, -2.25, 3.0])
    assert np.allclose(geo.str_to_np(geo.np_to_str(arr)), arr)
    mat = np.arange(12, dtype=float).reshape(3, 4)
    assert np.allclose(geo.str_to_np(geo.np_to_str(mat)), mat)


def test_rotation_matrix_z_basics():
    R = geo.rotation_matrix_z(np.pi / 2)
    assert np.allclose(R @ np.array([1.0, 0, 0]), [0, 1, 0], atol=1e-12)
    # batched
    Rb = geo.rotation_matrix_z(np.array([0.0, np.pi]))
    assert Rb.shape == (2, 3, 3)
    assert np.allclose(Rb[0], np.eye(3))
    assert np.allclose(Rb[1] @ [1, 0, 0], [-1, 0, 0], atol=1e-12)


def test_get_mat_angle_matches_reference_composition():
    # M = T(center+translation) @ Rz(a) @ T(-center) (pointcloud.py:279-289)
    t = np.array([1.0, 2.0, 0.5])
    a = 0.7
    c = np.array([3.0, -1.0, 0.0])
    M = geo.get_mat_angle(t, a, c)
    m1, m2, m3 = np.eye(4), np.eye(4), np.eye(4)
    m1[:3, 3] = -c
    m2[:3, :3] = geo.rotation_matrix_z(a)
    m3[:3, 3] = c + t
    assert np.allclose(M, m3 @ m2 @ m1, atol=1e-12)
    # the rotation center is a fixed point of the pure rotation
    M_rot = geo.get_mat_angle(None, a, c)
    assert np.allclose(geo.transform_points(c[None], M_rot)[0], c, atol=1e-12)


def test_angle_diff_wraps():
    assert geo.angle_diff(0.1, -0.1) == pytest.approx(0.2)
    assert geo.angle_diff(np.pi - 0.1, -np.pi + 0.1) == pytest.approx(-0.2)
    assert abs(geo.angle_diff(2 * np.pi, 0.0)) < 1e-12


def test_heuristic_use_smaller_angle():
    assert geo.heuristic_use_smaller_angle(np.array([np.pi]))[0] == pytest.approx(0.0)
    assert geo.heuristic_use_smaller_angle(np.array([0.3]))[0] == pytest.approx(0.3)
    assert geo.heuristic_use_smaller_angle(np.array([np.pi - 0.2]))[0] == pytest.approx(
        -0.2
    )


def test_rebase_rotation_center_identity_when_centers_equal():
    t = np.random.default_rng(0).normal(size=(5, 3))
    a = np.random.default_rng(1).uniform(-np.pi, np.pi, size=(5, 1))
    c = np.random.default_rng(2).normal(size=(5, 3))
    out = geo.translate_transform_to_new_center_of_rotation(t, a, c, c)
    assert np.allclose(out, t, atol=1e-12)


def test_rebase_rotation_center_moves_points_identically():
    """The re-based (translation, angle, new_center) transform must act on
    points exactly like the original (translation, angle, old_center)."""
    rng = np.random.default_rng(3)
    t = rng.normal(size=(4, 3))
    a = rng.uniform(-np.pi, np.pi, size=(4, 1))
    old_c = rng.normal(size=(4, 3))
    new_c = rng.normal(size=(4, 3))
    new_t = geo.translate_transform_to_new_center_of_rotation(t, a, old_c, new_c)
    pts = rng.normal(size=(4, 10, 3))
    for i in range(4):
        M_old = geo.get_mat_angle(t[i], a[i, 0], old_c[i])
        M_new = geo.get_mat_angle(new_t[i], a[i, 0], new_c[i])
        assert np.allclose(
            geo.transform_points(pts[i], M_old),
            geo.transform_points(pts[i], M_new),
            atol=1e-9,
        )


def test_constrain_transform_projects_to_yaw():
    # A pure yaw transform is unchanged.
    M = geo.get_mat_angle([1.0, 2.0, 3.0], 0.6)
    assert np.allclose(geo.constrain_transform(M), M, atol=1e-12)
    # A tilted rotation gets its yaw extracted, translation kept.
    import numpy.linalg as la

    tilt = np.eye(4)
    cx, sx = np.cos(0.2), np.sin(0.2)
    Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    tilt[:3, :3] = Rx @ geo.rotation_matrix_z(0.6)
    tilt[:3, 3] = [4.0, 5.0, 6.0]
    out = geo.constrain_transform(tilt)
    assert np.allclose(out[:3, 3], [4.0, 5.0, 6.0])
    # result rotation is orthonormal yaw-only
    assert np.allclose(out[2, :3], [0, 0, 1])
    assert np.allclose(la.det(out[:3, :3]), 1.0)
    _, yaw = geo.decompose_yaw(out)
    assert yaw == pytest.approx(0.6, abs=0.05)


def test_decompose_yaw_roundtrip():
    for angle in [-2.0, -0.5, 0.0, 1.0, 3.0]:
        M = geo.get_mat_angle([0.5, -0.5, 0.1], angle)
        t, yaw = geo.decompose_yaw(M)
        assert yaw == pytest.approx(geo.wrap_angle(angle), abs=1e-9)


def test_compose_gated_refinement():
    """Shared gated composition (geometry.compose_gated_refinement):
    accepted pairs get exactly dM @ M1; rejected pairs keep M1; the
    mod-pi wrap treats a pi-flipped increment as near-zero (flip
    resolution owns branch choice, the gate must not re-reject it)."""
    import numpy as np

    from alignnet3d_tpu.geometry import (
        compose_gated_refinement,
        get_mat_angle_batch,
    )

    M1 = get_mat_angle_batch(
        np.array([[1.0, 2.0, 0.0]] * 3),
        np.array([0.3, 0.3, 0.3]),
        np.zeros((3, 3)),
    )
    # pair 0: tiny increment (accepted); pair 1: big yaw (rejected);
    # pair 2: pi + tiny (mod-pi wrap -> accepted)
    t2 = np.array([[0.01, 0.0, 0.0], [0.01, 0.0, 0.0], [0.01, 0.0, 0.0]])
    a2 = np.array([0.01, 0.5, np.pi + 0.01])
    c2 = np.zeros((3, 3))
    M, ok = compose_gated_refinement(M1, t2, a2, c2,
                                     gate_deg=2.0, gate_xy=0.15)
    assert ok.tolist() == [True, False, True]
    dM = get_mat_angle_batch(t2, a2, c2)
    np.testing.assert_allclose(M[0], dM[0] @ M1[0], atol=1e-12)
    np.testing.assert_allclose(M[1], M1[1], atol=1e-12)
    np.testing.assert_allclose(M[2], dM[2] @ M1[2], atol=1e-12)
