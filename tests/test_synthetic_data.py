"""Synthetic generator + provider tests: on-disk format, geometric
consistency of generated scenes, packed fast path equivalence."""

import json
import os

import numpy as np
import pytest

from alignnet3d_tpu.config import config_from_dict
from alignnet3d_tpu.data import provider
from alignnet3d_tpu.data.synthetic import (
    SyntheticBoxScene,
    generate_dataset,
    lidar_rays,
    ray_box_hits,
)
from alignnet3d_tpu.geometry import get_mat_angle, transform_points


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    base = str(tmp_path_factory.mktemp("SynthFixture"))
    train_idx, val_idx = generate_dataset(
        base, num_train=12, num_val=6, seed=7, vres=24, hres=360
    )
    return base, train_idx, val_idx


def _cfg(base):
    return config_from_dict(
        {"data": {"basepath": base}, "model": {"num_points": 64}}
    )


def test_layout_and_meta_schema(dataset):
    base, train_idx, val_idx = dataset
    assert len(train_idx) == 12 and len(val_idx) == 6
    for sub in ("meta", "pointcloud1", "pointcloud2", "split"):
        assert os.path.isdir(os.path.join(base, sub))
    meta = json.load(open(f"{base}/meta/00000000.json"))
    for key in ("start_position", "start_angle", "end_position", "end_angle",
                "translation", "rel_angle", "seed", "cat", "mesh_scale"):
        assert key in meta, key


def test_meta_pose_consistency(dataset):
    base, _, _ = dataset
    for i in range(5):
        meta = json.load(open(f"{base}/meta/{i:08d}.json"))
        labels = provider.parse_meta_labels(meta)
        t, ra, c1, c2, a1, a2 = labels
        np.testing.assert_allclose(c2, c1 + t, atol=1e-9)
        assert a2 == pytest.approx(a1 + ra)
        assert abs(ra) <= np.pi / 2 + 1e-9


def test_cloud_lies_on_posed_box(dataset):
    """Transforming cloud1 into the object frame must land on the box
    surface (within noise)."""
    base, _, _ = dataset
    scene = SyntheticBoxScene(seed=7 * 1_000_003, vres=24, hres=360)
    for i in range(3):
        meta = json.load(open(f"{base}/meta/{i:08d}.json"))
        pc1 = np.load(f"{base}/pointcloud1/{i:08d}.npy")
        assert pc1.shape[0] >= 5 and pc1.shape[1] == 3
        t, ra, c1, c2, a1, a2 = provider.parse_meta_labels(meta)
        pose1 = get_mat_angle(c1, a1)
        local = transform_points(pc1, np.linalg.inv(pose1))
        # box half-extent bound: max dim is mesh_scale/2, plus noise clip
        bound = meta["mesh_scale"] / 2.0 + 0.06
        assert np.max(np.abs(local)) < bound


def test_relative_transform_aligns_clouds(dataset):
    """Applying the GT relative motion to cloud1 must land it on the
    object's pose-2 surface — the core registration invariant."""
    base, _, _ = dataset
    for i in range(3):
        meta = json.load(open(f"{base}/meta/{i:08d}.json"))
        pc1 = np.load(f"{base}/pointcloud1/{i:08d}.npy")
        t, ra, c1, c2, a1, a2 = provider.parse_meta_labels(meta)
        pose1 = get_mat_angle(c1, a1)
        pose2 = get_mat_angle(c2, a2)
        # The labels' convention: (translation, rel_angle) acting about
        # rotation center pc1_center IS the cloud1->cloud2 world map —
        # algebraically equal to pose2 @ pose1^-1.
        rel_about_c1 = get_mat_angle(t, ra, rotation_center=c1)
        np.testing.assert_allclose(
            rel_about_c1, pose2 @ np.linalg.inv(pose1), atol=1e-9
        )
        moved = transform_points(pc1, rel_about_c1)
        local = transform_points(moved, np.linalg.inv(pose2))
        bound = meta["mesh_scale"] / 2.0 + 0.06
        assert np.max(np.abs(local)) < bound


def test_ray_box_hits_axis_aligned():
    dirs = lidar_rays(8, 90)
    pose = np.eye(4)
    pose[:3, 3] = [0.0, 10.0, 0.0]  # box straight ahead (+y)
    pts = ray_box_hits(dirs, pose, np.array([1.0, 1.0, 1.0]))
    assert len(pts) > 0
    # all hits on the near face or box edges: y in [9, 11], mostly y=9
    assert np.all(pts[:, 1] >= 9.0 - 1e-9) and np.all(pts[:, 1] <= 11.0 + 1e-9)
    assert np.min(pts[:, 1]) == pytest.approx(9.0, abs=1e-6)
    # nothing behind the sensor
    assert np.all(pts[:, 1] > 0)


def test_provider_load_batch_and_packed_equivalence(dataset):
    base, train_idx, val_idx = dataset
    cfg = _cfg(base)
    rng = np.random.default_rng(0)
    batch = provider.load_batch(cfg, val_idx, override_batch_size=len(val_idx),
                                rng=rng)
    pcs1, pcs2, t, ra, c1, c2, a1, a2 = batch
    assert pcs1.shape == (6, 64, 3)
    assert np.all(np.isfinite(pcs1))

    packed = provider.PackedDataset(base)
    pb = packed.sample_batch(val_idx, 64, np.random.default_rng(0))
    # labels must agree exactly between the two paths
    for ref, fast in zip(batch[2:], pb[2:]):
        np.testing.assert_allclose(np.asarray(ref, float).reshape(-1),
                                   np.asarray(fast, float).reshape(-1),
                                   atol=1e-12)
    # resampled points are drawn from the same source cloud
    src = np.load(f"{base}/pointcloud1/{val_idx[0]:08d}.npy")
    fast_pts = pb[0][0]
    d = np.linalg.norm(fast_pts[:, None, :] - src[None, :, :3], axis=-1).min(1)
    assert np.max(d) < 1e-6


def test_packed_cache_roundtrip(dataset):
    base, _, val_idx = dataset
    p1 = provider.PackedDataset(base)  # writes cache
    assert os.path.isfile(os.path.join(base, f"packed_v{provider.PACK_VERSION}.npz"))
    p2 = provider.PackedDataset(base)  # loads cache
    np.testing.assert_array_equal(p1.counts1, p2.counts1)
    np.testing.assert_allclose(p1.points1, p2.points1)
    np.testing.assert_allclose(p1.translations, p2.translations)
    metas = p2.metas(val_idx[:2])
    assert "rel_angle" in metas[0]


def test_prefetch_iterator():
    out = list(provider.PrefetchIterator(lambda i: i * i, 5, prefetch=2))
    assert out == [0, 1, 4, 9, 16]

    def boom(i):
        if i == 2:
            raise ValueError("boom")
        return i

    it = provider.PrefetchIterator(boom, 5)
    with pytest.raises(ValueError):
        list(it)


def test_hard_mode_corruptions():
    """Hard scenes (the synthetic stand-in for the reference's KITTI Hard
    variants, pointcloud.py:623-642) are deterministic, flagged in meta,
    and strictly remove target returns vs the easy twin (occlusion /
    truncation), modulo appended clutter points."""
    n_occ = n_trunc = 0
    for seed in range(30):
        h = SyntheticBoxScene(seed=seed, vres=32, hres=720, hard=True)
        h.generate_pointcloud()
        h2 = SyntheticBoxScene(seed=seed, vres=32, hres=720, hard=True)
        h2.generate_pointcloud()
        for a, b in zip(h.pointclouds, h2.pointclouds):
            np.testing.assert_array_equal(a, b)
        meta = h.additional_meta["hard"]
        n_occ += meta["occluded"]
        n_trunc += meta["truncated"]
        if meta["truncated"] and not meta["occluded"]:
            # truncation alone only removes points (no clutter source)
            e = SyntheticBoxScene(seed=seed, vres=32, hres=720, hard=False)
            e.generate_pointcloud()
            assert len(h.pointclouds[0]) <= len(e.pointclouds[0])
    assert n_occ > 0 and n_trunc > 0


def test_hard_dataset_generation(tmp_path):
    base = str(tmp_path / "hard")
    train, val = generate_dataset(base, 6, 3, seed=5, hard=True)
    assert len(train) == 6 and len(val) == 3
    metas = [json.load(open(f"{base}/meta/{i:08d}.json"))
             for i in train + val]
    assert all("hard" in m for m in metas)
    for i in train + val:
        pc = np.load(f"{base}/pointcloud1/{i:08d}.npy")
        assert len(pc) >= 5
