"""FPFH + RANSAC global registration: normals, descriptor invariance,
transform recovery."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alignnet3d_tpu.geometry import get_mat_angle, transform_points
from alignnet3d_tpu.icp import fpfh


def _L_cloud(rng, n=400):
    """An L-shaped (asymmetric) surface cloud: two perpendicular planes of
    different sizes — gives FPFH something distinctive."""
    n1 = n // 2
    a = np.stack([rng.uniform(0, 2.0, n1), rng.uniform(0, 1.0, n1),
                  np.zeros(n1)], axis=1)
    b = np.stack([rng.uniform(0, 0.8, n - n1), np.zeros(n - n1),
                  rng.uniform(0, 0.9, n - n1)], axis=1)
    return np.concatenate([a, b]).astype(np.float32)


def test_voxel_downsample():
    pts = np.array([[0.01, 0.01, 0.0], [0.02, 0.02, 0.0], [1.0, 1.0, 1.0]])
    out = fpfh.voxel_downsample(pts, 0.1)
    assert len(out) == 2
    # centroid of the merged voxel
    assert np.allclose(sorted(out[:, 0]), [0.015, 1.0], atol=1e-6)


def test_normals_of_plane(rng):
    pts = np.stack([rng.uniform(-1, 1, 256), rng.uniform(-1, 1, 256),
                    np.zeros(256)], axis=1).astype(np.float32)
    pts[:, 2] += 5.0  # plane z=5, sensor at origin below
    normals = np.asarray(fpfh.estimate_normals(
        jnp.asarray(pts), jnp.ones(256, bool)
    ))
    # normal is +-z, oriented toward origin => -z
    assert np.allclose(np.abs(normals[:, 2]), 1.0, atol=1e-3)
    assert np.all(normals[:, 2] < 0)


def test_fpfh_rigid_invariance(rng):
    """FPFH descriptors are (approximately) invariant under a rigid motion
    of the whole cloud. The cloud sits away from the origin (like real
    scans) so the sensor-facing normal orientation is stable."""
    pts = _L_cloud(rng) + np.array([5.0, 3.0, 0.0], np.float32)
    mask = jnp.ones(len(pts), bool)
    f1, _ = fpfh.fpfh_features(jnp.asarray(pts), mask, radius=0.5)
    M = get_mat_angle([0.3, -0.2, 0.1], 0.4, rotation_center=[5.0, 3.0, 0.0])
    moved = transform_points(pts, M).astype(np.float32)
    f2, _ = fpfh.fpfh_features(jnp.asarray(moved), mask, radius=0.5)
    f1, f2 = np.asarray(f1), np.asarray(f2)
    denom = np.maximum(np.linalg.norm(f1, axis=1), 1e-6)
    rel = np.linalg.norm(f1 - f2, axis=1) / denom
    assert np.median(rel) < 0.15, np.median(rel)


def test_ransac_recovers_large_yaw(rng):
    src = _L_cloud(rng) + np.array([3.0, 1.0, 0.0], np.float32)
    gt = get_mat_angle([0.5, -0.3, 0.0], 2.4)  # ~137 degrees
    dst = transform_points(src, gt).astype(np.float32)
    out, fit, rmse = fpfh.fpfh_ransac_pair(
        src, dst, voxel_size=0.05, num_hypotheses=1024, max_points=512,
    )
    moved = transform_points(src, out)
    err = np.linalg.norm(moved - dst, axis=1)
    # RANSAC produces the coarse basin; the reference refines with p2p
    # afterwards (the *_p2p variants, icp.py:107-116)
    assert np.median(err) < 0.35, (np.median(err), fit, rmse)
    assert fit > 0.1  # coarse-stage inliers at the tight threshold

    from alignnet3d_tpu.icp.p2point import icp_p2point_batch

    a = src[None]
    m = np.ones((1, len(src)), bool)
    tf, fit2, rmse2 = icp_p2point_batch(
        a, m, dst[None], m, out[None], radius=0.1, its=30
    )
    refined = transform_points(src, tf[0])
    assert np.median(np.linalg.norm(refined - dst, axis=1)) < 0.02
    assert fit2[0] > 0.95


def test_ransac_mutual_filter_recovery_and_fallback(rng):
    """The reciprocal-match pruning (VERDICT r2 item 4) must still recover
    the transform, and with a degenerate feature set it must fall back to
    the unpruned correspondences instead of sampling an empty set."""
    src = _L_cloud(rng) + np.array([3.0, 1.0, 0.0], np.float32)
    gt = get_mat_angle([0.4, -0.2, 0.0], 1.9)
    dst = transform_points(src, gt).astype(np.float32)

    def run(mutual):
        n = 384
        down_s = fpfh.voxel_downsample(src, 0.05, max_points=n)
        down_d = fpfh.voxel_downsample(dst, 0.05, max_points=n)
        pad = lambda a: np.pad(a, ((0, n - len(a)), (0, 0)))  # noqa: E731
        msk = lambda a: np.arange(n) < len(a)  # noqa: E731
        sp, dp = jnp.asarray(pad(down_s)), jnp.asarray(pad(down_d))
        sm, dm = jnp.asarray(msk(down_s)), jnp.asarray(msk(down_d))
        sf, _ = fpfh.fpfh_features(sp, sm, 0.25)
        df, _ = fpfh.fpfh_features(dp, dm, 0.25)
        R, t, fit, rmse = fpfh.ransac_registration(
            sp, sm, dp, dm, sf, df, jax.random.PRNGKey(0), 0.075,
            num_hypotheses=1024, mutual_filter=mutual,
        )
        out = np.eye(4)
        out[:3, :3], out[:3, 3] = np.asarray(R), np.asarray(t)
        return out, float(fit)

    out_m, fit_m = run(True)
    err_m = np.median(np.linalg.norm(
        transform_points(src, out_m) - dst, axis=1))
    assert err_m < 0.35, (err_m, fit_m)

    # degenerate features: identical descriptors make the reciprocal set
    # nearly empty -> the fallback must keep RANSAC sampling valid (no
    # NaNs, a finite transform)
    n = 64
    pts = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)
    msk = jnp.ones(n, bool)
    flat = jnp.ones((n, 33), jnp.float32)
    R, t, fit, rmse = fpfh.ransac_registration(
        pts, msk, pts, msk, flat, flat, jax.random.PRNGKey(1), 0.075,
        num_hypotheses=64, mutual_filter=True,
    )
    assert np.all(np.isfinite(np.asarray(R))) and np.all(
        np.isfinite(np.asarray(t)))


def test_ransac_constraint_yields_yaw_only(rng):
    src = _L_cloud(rng)
    gt = get_mat_angle([0.2, 0.1, 0.0], -1.0)
    dst = transform_points(src, gt).astype(np.float32)
    out, fit, rmse = fpfh.fpfh_ransac_pair(
        src, dst, voxel_size=0.05, num_hypotheses=512, max_points=384,
    )
    assert np.allclose(out[2, :2], 0.0, atol=1e-6)
    assert np.allclose(out[:2, 2], 0.0, atol=1e-6)


def test_fgr_recovers_large_yaw(rng):
    """Fast Global Registration (icp/fgr.py) lands in the right basin on a
    137-degree yaw with translation; p2p refine finishes the job (the
    reference's o3_gicp_fast_p2p variant, icp.py:121-143)."""
    src = _L_cloud(rng) + np.array([3.0, 1.0, 0.0], np.float32)
    gt = get_mat_angle([0.5, -0.3, 0.0], 2.4)
    dst = transform_points(src, gt).astype(np.float32)
    out, fit, rmse = fpfh.global_registration_batch(
        src[None], np.ones((1, len(src)), bool),
        dst[None], np.ones((1, len(dst)), bool),
        voxel_size=0.05, method="fgr", max_points=512,
    )
    moved = transform_points(src, out[0])
    err = np.linalg.norm(moved - dst, axis=1)
    assert np.median(err) < 0.35, (np.median(err), fit, rmse)

    from alignnet3d_tpu.icp.p2point import icp_p2point_batch

    m = np.ones((1, len(src)), bool)
    tf, fit2, _ = icp_p2point_batch(
        src[None], m, dst[None], m, out, radius=0.1, its=30
    )
    refined = transform_points(src, tf[0])
    assert np.median(np.linalg.norm(refined - dst, axis=1)) < 0.02


def test_fgr_constraint_yields_yaw_only(rng):
    src = _L_cloud(rng)
    gt = get_mat_angle([0.2, 0.1, 0.0], -1.0)
    dst = transform_points(src, gt).astype(np.float32)
    out, _, _ = fpfh.global_registration_batch(
        src[None], np.ones((1, len(src)), bool),
        dst[None], np.ones((1, len(dst)), bool),
        voxel_size=0.05, method="fgr", max_points=384,
    )
    assert np.allclose(out[0][2, :2], 0.0, atol=1e-6)
    assert np.allclose(out[0][:2, 2], 0.0, atol=1e-6)


def test_batched_ransac_matches_per_pair(rng):
    """global_registration_batch(method='ransac') recovers each pair of a
    heterogeneous 3-pair batch (the vmapped replacement of the round-1
    per-pair loop)."""
    pairs = []
    for k, yaw in enumerate((0.6, -1.2, 2.0)):
        src = _L_cloud(rng, n=300) + np.array([2.0 + k, 1.0, 0.0],
                                              np.float32)
        gt = get_mat_angle([0.2, -0.1, 0.0], yaw)
        dst = transform_points(src, gt).astype(np.float32)
        pairs.append((src, dst, gt))
    src = np.stack([p[0] for p in pairs])
    dst = np.stack([p[1] for p in pairs])
    msk = np.ones(src.shape[:2], bool)
    out, fit, rmse = fpfh.global_registration_batch(
        src, msk, dst, msk, voxel_size=0.05, method="ransac",
        max_points=384, num_hypotheses=1024,
    )
    for i, (s, d, _) in enumerate(pairs):
        moved = transform_points(s, out[i])
        assert np.median(np.linalg.norm(moved - d, axis=1)) < 0.35, i


def test_ransac_hypothesis_chunking_equivalent(rng):
    """num_hypotheses > 2048 takes the lax.map chunked path (HBM-bounded
    for the K=16k sweep, fpfh.py ransac_registration); the per-chunk
    best-of-bests reduction must recover the same transform the flat
    vmap does."""
    import jax

    src = _L_cloud(rng, n=256)
    gt = get_mat_angle([1.0, 2.0, 0.1], 0.6)
    dst = transform_points(src, gt).astype(np.float32)
    m = np.ones(len(src), bool)
    feat = rng.normal(size=(len(src), 8)).astype(np.float32)
    key = jax.random.PRNGKey(0)
    results = {}
    for k in (2048, 4096):  # flat path vs 2-chunk lax.map path
        R, t, fit, _ = fpfh.ransac_registration(
            src, m, dst, m, feat, feat, key, 0.1, num_hypotheses=k)
        results[k] = (np.asarray(R), np.asarray(t), float(fit))
    for k, (R, t, fit) in results.items():
        yaw = np.arctan2(R[1, 0], R[0, 0])
        assert abs(yaw - 0.6) < 1e-3, (k, yaw)
        assert np.allclose(t, [1.0, 2.0, 0.1], atol=1e-3), (k, t)
        assert fit > 0.99, (k, fit)


def test_ransac_odd_hypothesis_count_chunks(rng):
    """K > 2048 that is NOT a chunk multiple must still take the padded
    lax.map path (review finding: the old exact-multiple condition fell
    back to the flat vmap and its HBM blow-up) and recover the pose."""
    import jax

    src = _L_cloud(rng, n=128)
    gt = get_mat_angle([0.5, -1.0, 0.0], -0.8)
    dst = transform_points(src, gt).astype(np.float32)
    m = np.ones(len(src), bool)
    feat = rng.normal(size=(len(src), 8)).astype(np.float32)
    R, t, fit, _ = fpfh.ransac_registration(
        src, m, dst, m, feat, feat, jax.random.PRNGKey(1), 0.1,
        num_hypotheses=3000)
    yaw = np.arctan2(np.asarray(R)[1, 0], np.asarray(R)[0, 0])
    assert abs(yaw - (-0.8)) < 1e-3
    assert float(fit) > 0.99
