"""Grid-connectivity clutter filter (data/denoise.py) + the provider's
component-filter view: labeling semantics, keep rules, packed-view
integration, and composition with the voxel resample view.

Framework addition; no reference analogue (the reference's box crop
keeps neighbor returns, pointcloud.py:597-738)."""

import json
import os

import numpy as np
import pytest

from alignnet3d_tpu.data.denoise import (
    component_filter_indices,
    component_keep_mask,
    grid_component_labels,
)


def _two_clusters(rng, n_a=200, n_b=80, gap=5.0):
    # uniform boxes: at these densities no intra-cluster gap can exceed
    # one 0.5m cell, so the grid components are exactly the two clusters
    a = rng.uniform(-0.5, 0.5, size=(n_a, 3))
    b = rng.uniform(-0.4, 0.4, size=(n_b, 3)) + np.array([gap, 0.0, 0.0])
    return np.concatenate([a, b]), n_a, n_b


def test_labels_separate_distant_clusters():
    rng = np.random.default_rng(0)
    pts, n_a, _ = _two_clusters(rng)
    labels = grid_component_labels(pts, cell=0.5)
    assert len(np.unique(labels[:n_a])) == 1
    assert len(np.unique(labels[n_a:])) == 1
    assert labels[0] != labels[-1]


def test_labels_merge_touching_clusters():
    rng = np.random.default_rng(1)
    # bridge of points closer than one cell connects everything
    line = np.stack([np.linspace(0, 5, 40), np.zeros(40), np.zeros(40)], 1)
    pts, _, _ = _two_clusters(rng)
    labels = grid_component_labels(np.concatenate([pts, line]), cell=0.5)
    assert len(np.unique(labels)) == 1


def test_keep_largest_and_central():
    rng = np.random.default_rng(2)
    pts, n_a, n_b = _two_clusters(rng)
    mask_l = component_keep_mask(pts, cell=0.5, keep="largest")
    assert mask_l[:n_a].all() and not mask_l[n_a:].any()
    # central: the majority cluster also owns the coordinate median here
    mask_c = component_keep_mask(pts, cell=0.5, keep="central")
    assert (mask_c == mask_l).all()
    # flip the counts: largest now keeps B, central still keeps the
    # cluster around the median (which moves with the majority => B too)
    pts2 = np.concatenate([pts[:50], pts[n_a:]])
    mask2 = component_keep_mask(pts2, cell=0.5, keep="largest")
    assert mask2[50:].all() and not mask2[:50].any()


def test_edge_cases():
    assert component_keep_mask(np.zeros((0, 3)), 0.5).shape == (0,)
    one = component_keep_mask(np.zeros((5, 3)), 0.5)
    assert one.all()
    with pytest.raises(ValueError):
        component_keep_mask(np.zeros((5, 3)), 0.5, keep="bogus")


def test_block_indices_convention():
    rng = np.random.default_rng(3)
    pts1, n_a, _ = _two_clusters(rng)
    pts2, n_c, _ = _two_clusters(rng, n_a=60, n_b=150)
    block = np.concatenate([pts1, pts2])
    cid = np.concatenate([np.zeros(len(pts1)), np.ones(len(pts2))])
    kept = component_filter_indices(block, cid, 0.5, "largest")
    # cloud 0 keeps its first n_a rows; cloud 1 keeps its LAST 150
    want0 = np.arange(n_a)
    want1 = len(pts1) + n_c + np.arange(150)
    assert np.array_equal(kept, np.concatenate([want0, want1]))


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    """4-scene dataset where every cloud carries a far clutter cluster."""
    base = str(tmp_path_factory.mktemp("dn_data"))
    rng = np.random.default_rng(7)
    for sub in ("meta", "pointcloud1", "pointcloud2", "split"):
        os.makedirs(f"{base}/{sub}")
    for i in range(4):
        for k in (1, 2):
            pts, _, _ = _two_clusters(rng, n_a=120, n_b=40)
            np.save(f"{base}/pointcloud{k}/{i:08d}", pts.astype(np.float32))
        meta = {
            "start_position": "1.0 2.0 0.0", "start_angle": 0.1,
            "end_position": "1.5 2.0 0.0", "end_angle": 0.2,
            "translation": "0.5 0.0 0.0", "rel_angle": 0.1,
        }
        json.dump(meta, open(f"{base}/meta/{i:08d}.json", "w"))
    open(f"{base}/split/train.txt", "w").write("0\n1\n")
    open(f"{base}/split/val.txt", "w").write("2\n3\n")
    return base


def test_packed_component_filter_view(tiny_dataset):
    from alignnet3d_tpu.data import provider

    ds = provider.PackedDataset(tiny_dataset)
    before = np.asarray(ds.counts1).copy()
    ds.enable_component_filter(cell=0.5, keep="largest")
    after = np.asarray(ds.counts1)
    assert (after == 120).all() and (before == 160).all()
    # offsets consistent with new counts, points array resized
    assert len(ds.points1) == int(after.sum())
    assert ds.offsets1[-1] == len(ds.points1)
    # cached: a second dataset loads the filtered view from disk
    ds2 = provider.PackedDataset(tiny_dataset)
    ds2.enable_component_filter(cell=0.5, keep="largest")
    assert np.allclose(np.asarray(ds2.points1), np.asarray(ds.points1))
    # composition: voxel view builds on the FILTERED parent, under a
    # denoise-suffixed cache stem (no collision with unfiltered caches)
    ds2.enable_voxel_resample(0.1)
    pfile, _ = ds2._vox_cache_files(1, 0.1)
    assert "dn0.5l" in pfile
    vpts, offs, vcounts = ds2._vox[1]
    assert (vcounts <= 120).all() and vcounts.sum() == len(vpts)


def test_component_filter_order_guard(tiny_dataset):
    from alignnet3d_tpu.data import provider

    ds = provider.PackedDataset(tiny_dataset)
    ds.enable_voxel_resample(0.1, cache=False)
    with pytest.raises(AssertionError):
        ds.enable_component_filter(0.5, "largest")
