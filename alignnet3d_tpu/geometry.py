"""Pure-numpy rigid-motion math shared by the data pipeline, metrics and ICP.

Semantics match the reference's geometry toolbox
(reference tp_utils/pointcloud.py:247-318, 442-444, 1208-1254) but the
implementations are vectorized numpy written from scratch — the reference
loops per sample (e.g. translate_transform_to_new_center_of_rotation,
pointcloud.py:309-318); here everything is batched.

All rotations in this problem are yaw-only (rotation about +z); poses are
(translation[3], yaw) pairs acting about an explicit rotation center.
"""

from __future__ import annotations

import base64
import io

import numpy as np

__all__ = [
    "np_to_str",
    "str_to_np",
    "rotation_matrix_z",
    "get_mat_angle",
    "transform_points",
    "angle_diff",
    "wrap_angle",
    "heuristic_use_smaller_angle",
    "translate_transform_to_new_center_of_rotation",
    "constrain_transform",
    "decompose_yaw",
]


def np_to_str(arr: np.ndarray, plaintext: bool = True) -> str:
    """Serialize an array to the ASCII codec used in dataset meta JSON files.

    Format-compatible with the reference codec (pointcloud.py:247-257) so the
    on-disk dataset layout (README.md:50-69) round-trips unchanged.
    """
    output = io.BytesIO()
    if plaintext:
        np.savetxt(output, np.asarray(arr))
        return output.getvalue().decode("ascii")
    np.savez_compressed(output, arr=np.asarray(arr))
    return base64.b64encode(output.getvalue()).decode("ascii")


def str_to_np(s: str, plaintext: bool = True) -> np.ndarray:
    """Inverse of :func:`np_to_str` (reference pointcloud.py:260-265)."""
    if plaintext:
        return np.loadtxt(io.BytesIO(s.encode("ascii")))
    raw = base64.b64decode(s)
    return np.load(io.BytesIO(raw))["arr"]


def rotation_matrix_z(angle) -> np.ndarray:
    """3x3 rotation(s) about +z. Accepts scalars or arrays; batched output.

    For input shape ``S`` returns shape ``S + (3, 3)``.
    """
    a = np.asarray(angle, dtype=np.float64)
    c, s = np.cos(a), np.sin(a)
    zeros = np.zeros_like(c)
    ones = np.ones_like(c)
    rows = np.stack(
        [
            np.stack([c, -s, zeros], axis=-1),
            np.stack([s, c, zeros], axis=-1),
            np.stack([zeros, zeros, ones], axis=-1),
        ],
        axis=-2,
    )
    return rows


def get_mat_angle(
    translation=None, rotation=None, rotation_center=np.array([0.0, 0.0, 0.0])
) -> np.ndarray:
    """4x4 homogeneous transform: rotate by ``rotation`` (yaw) about
    ``rotation_center``, then translate by ``translation``.

    Matches reference pointcloud.py:279-289:
    ``M = T(center + translation) @ Rz(rotation) @ T(-center)``.
    """
    center = np.asarray(rotation_center, dtype=np.float64).reshape(3)
    mat = np.eye(4)
    if rotation is not None:
        mat[:3, :3] = rotation_matrix_z(float(np.asarray(rotation).reshape(-1)[0]))
    mat[:3, 3] = center - mat[:3, :3] @ center
    if translation is not None:
        mat[:3, 3] += np.asarray(translation, dtype=np.float64).reshape(3)
    return mat


def transform_points(points: np.ndarray, mat: np.ndarray) -> np.ndarray:
    """Apply a 4x4 transform to an (N, 3) array of points."""
    pts = np.asarray(points, dtype=np.float64)
    return pts @ mat[:3, :3].T + mat[:3, 3]


def get_mat_angle_batch(translation, rotation, rotation_center) -> np.ndarray:
    """Vectorized :func:`get_mat_angle`: (n,3),(n,),(n,3) -> (n,4,4)."""
    t = np.asarray(translation, dtype=np.float64).reshape(-1, 3)
    a = np.asarray(rotation, dtype=np.float64).reshape(-1)
    c = np.asarray(rotation_center, dtype=np.float64).reshape(-1, 3)
    n = len(a)
    ca, sa = np.cos(a), np.sin(a)
    M = np.tile(np.eye(4), (n, 1, 1))
    M[:, 0, 0] = ca
    M[:, 0, 1] = -sa
    M[:, 1, 0] = sa
    M[:, 1, 1] = ca
    M[:, :3, 3] = c - np.einsum("nij,nj->ni", M[:, :3, :3], c) + t
    return M


def invert_rigid_batch(M: np.ndarray) -> np.ndarray:
    """Inverse of a batch of rigid 4x4 transforms: [[R.T, -R.T t], [0, 1]]."""
    R = M[..., :3, :3]
    out = np.tile(np.eye(4), M.shape[:-2] + (1, 1))
    Rt = np.swapaxes(R, -1, -2)
    out[..., :3, :3] = Rt
    out[..., :3, 3] = -np.einsum("...ij,...j->...i", Rt, M[..., :3, 3])
    return out


def compose_gated_refinement(M1, t2, a2, c2, gate_deg: float,
                             gate_xy: float):
    """Trust-gated composition of a refinement pass onto coarse
    transforms M1 (n,4,4): build dM from the pass's raw predictions
    (t2, a2, c2), compose dM @ M1, and accept per pair only inside the
    trust region |da| <= gate_deg (nearest mod-pi branch — flip
    resolution already picked the branch) and |dxy| <= gate_xy. The
    incremental world displacement AT the object equals the raw pass
    translation (dM @ c2 = c2 + t2), so the gate needs no re-basing.

    Single implementation shared by the eval path
    (trainer._network_refine_pass), the serving path (api.Aligner.align)
    and the probe (scripts/probe_iter_refine.py) — these diverged once
    (flip-policy review finding) when each carried its own copy.
    Returns (M (n,4,4), accepted (n,) bool).
    """
    a2 = np.asarray(a2, np.float64).reshape(-1)
    t2 = np.asarray(t2, np.float64).reshape(-1, 3)
    dM = get_mat_angle_batch(t2, a2, c2)
    M = np.einsum("nij,njk->nik", dM, M1)
    da = (a2 + np.pi / 2) % np.pi - np.pi / 2
    ok = (np.abs(np.degrees(da)) <= gate_deg) & (
        np.linalg.norm(t2[:, :2], axis=1) <= gate_xy
    )
    return np.where(ok[:, None, None], M, M1), ok


def wrap_angle(a):
    """Wrap angle(s) to (-pi, pi]."""
    return (np.asarray(a) + np.pi) % (2.0 * np.pi) - np.pi


def angle_diff(a, b):
    """Signed smallest difference ``a - b`` wrapped to (-pi, pi]
    (reference pointcloud.py:442-444)."""
    return wrap_angle(np.asarray(a) - np.asarray(b))


def heuristic_use_smaller_angle(pred_angles: np.ndarray) -> np.ndarray:
    """Map any angle in the 'large' half-circle to its 180-degree complement
    (reference pointcloud.py:301-306). Used for symmetric-object outputs."""
    a = np.mod(np.asarray(pred_angles, dtype=np.float64), 2.0 * np.pi)
    large = np.logical_and(a > 0.5 * np.pi, a < 1.5 * np.pi)
    a = np.where(large, np.mod(a + np.pi, 2.0 * np.pi), a)
    return np.mod(a + np.pi, 2.0 * np.pi) - np.pi


def translate_transform_to_new_center_of_rotation(
    all_pred_translations: np.ndarray,
    all_pred_angles: np.ndarray,
    all_pred_centers: np.ndarray,
    all_gt_pc1centers: np.ndarray,
) -> np.ndarray:
    """Re-express predicted translations so the rotation acts about the GT
    center instead of the predicted center.

    Same math as reference pointcloud.py:309-318 —
    ``t' = -(c_new - c_old) + Rz(a) @ (c_new - c_old) + t`` — but vectorized
    over the whole prediction set instead of a Python loop.
    """
    t = np.asarray(all_pred_translations, dtype=np.float64).reshape(-1, 3)
    a = np.asarray(all_pred_angles, dtype=np.float64).reshape(-1)
    shift = (
        np.asarray(all_gt_pc1centers, dtype=np.float64).reshape(-1, 3)
        - np.asarray(all_pred_centers, dtype=np.float64).reshape(-1, 3)
    )
    rot = rotation_matrix_z(a)  # (B, 3, 3)
    rotated_shift = np.einsum("bij,bj->bi", rot, shift)
    return (-shift + rotated_shift + t).astype(t.dtype)


def constrain_transform(transform: np.ndarray) -> np.ndarray:
    """Project a 4x4 rigid transform onto ground-plane motion: keep the
    translation, replace the rotation by its best yaw-only approximation.

    Semantics of the reference's Python port of CloudCompare's
    FilterTransformation (pointcloud.py:1208-1254) with
    ``constrain_rotation='xy'`` — the same constraint the forked Open3D
    applies on the C++ side via ``with_constraint`` (icp.py:76).
    """
    new_transform = np.eye(4)
    new_transform[:3, 3] = transform[:3, 3]
    R = transform[:3, :3]
    if R[2, 0] < 1.0:
        theta = -np.arcsin(R[2, 0])
        cos_theta = np.cos(theta)
        phi = np.arctan2(R[1, 0] / cos_theta, R[0, 0] / cos_theta)
        new_transform[0, 0] = np.cos(phi)
        new_transform[1, 1] = np.cos(phi)
        new_transform[1, 0] = np.sin(phi)
        new_transform[0, 1] = -np.sin(phi)
    return new_transform


def decompose_yaw(transform: np.ndarray) -> tuple[np.ndarray, float]:
    """Extract (translation, yaw) from a (possibly yaw-only) 4x4 transform.

    Equivalent of the reference's ``Rotation.from_dcm(R).as_euler('xyz')[2]``
    extraction (train.py:476-482) for ground-plane transforms.
    """
    yaw = float(np.arctan2(transform[1, 0], transform[0, 0]))
    return np.asarray(transform[:3, 3], dtype=np.float64), yaw
