"""Density-equalized (voxel) resampling view on PackedDataset.

Framework addition (no reference analogue — the reference only has
uniform resample-with-replacement, provider.py:97-98). Motivated by the
round-3 error-structure study: near-range beam-model scans are
quadratically denser, so uniform resampling over-represents the nearest
car panel (scripts/analyze_error_structure.py).
"""

import numpy as np

from alignnet3d_tpu.data import provider


def _dataset_from_arrays(tmp_path, clouds1, clouds2):
    """Build a PackedDataset directly from in-memory ragged clouds."""
    ds = provider.PackedDataset.__new__(provider.PackedDataset)
    ds.basepath = str(tmp_path)
    ds._vox = None
    n = len(clouds1)
    arrays = {
        "indices": np.arange(n, dtype=np.int64),
        "metas": np.asarray(["{}"] * n),
        "translations": np.zeros((n, 3)),
        "rel_angles": np.zeros(n),
        "pc1centers": np.zeros((n, 3)),
        "pc2centers": np.zeros((n, 3)),
        "pc1angles": np.zeros(n),
        "pc2angles": np.zeros(n),
    }
    for k, clouds in ((1, clouds1), (2, clouds2)):
        arrays[f"points{k}"] = (
            np.concatenate(clouds).astype(np.float32)
            if clouds else np.zeros((0, 3), np.float32)
        )
        arrays[f"counts{k}"] = np.asarray(
            [len(c) for c in clouds], dtype=np.int64
        )
    ds._init_from_arrays(arrays)
    ds.index_map = {i: i for i in range(n)}
    return ds


def _cluster_cloud():
    """100 coincident points (one voxel) + 10 isolated points."""
    dense = np.zeros((100, 3), np.float32)
    sparse = np.stack([
        np.arange(1, 11, dtype=np.float32) * 5.0,
        np.zeros(10, np.float32),
        np.zeros(10, np.float32),
    ], axis=1)
    return np.concatenate([dense, sparse])


class TestVoxelView:
    def test_counts_dedup_dense_cluster(self, tmp_path):
        ds = _dataset_from_arrays(tmp_path, [_cluster_cloud()],
                                  [_cluster_cloud()])
        ds.enable_voxel_resample(0.1, cache=False)
        kept, offs, counts = ds._vox[1]
        assert counts.tolist() == [11]
        assert offs.tolist() == [0, 11]

    def test_sampling_density_equalized(self, tmp_path):
        cloud = _cluster_cloud()
        ds = _dataset_from_arrays(tmp_path, [cloud], [cloud])
        rng = np.random.default_rng(0)
        # uniform: the dense cluster (origin) gets ~100/110 of the picks
        b = ds.sample_batch([0], 2048, rng, use_native=False)
        frac_uniform = np.mean(np.all(b[0][0] == 0.0, axis=-1))
        assert frac_uniform > 0.8
        ds.enable_voxel_resample(0.1, cache=False)
        b = ds.sample_batch([0], 2048, rng)
        frac_vox = np.mean(np.all(b[0][0] == 0.0, axis=-1))
        # voxel view: the cluster is ONE of 11 representatives
        assert frac_vox < 0.2
        # sparse singletons are unaffected members of the view
        xs = np.unique(b[0][0][:, 0])
        assert len(xs) == 11

    def test_far_sparse_cloud_unchanged(self, tmp_path):
        # spacing (5 m) >> voxel (0.1 m): the view keeps every point
        cloud = _cluster_cloud()[100:]
        ds = _dataset_from_arrays(tmp_path, [cloud], [cloud])
        ds.enable_voxel_resample(0.1, cache=False)
        _, _, counts = ds._vox[1]
        assert counts.tolist() == [len(cloud)]

    def test_empty_cloud_zeros(self, tmp_path):
        ds = _dataset_from_arrays(
            tmp_path, [np.zeros((0, 3), np.float32)],
            [np.zeros((0, 3), np.float32)],
        )
        ds.enable_voxel_resample(0.1, cache=False)
        b = ds.sample_batch([0], 16, np.random.default_rng(0))
        assert np.all(b[0] == 0.0) and np.all(b[1] == 0.0)

    def test_cache_roundtrip(self, tmp_path):
        cloud = _cluster_cloud()
        ds = _dataset_from_arrays(tmp_path, [cloud], [cloud])
        ds.enable_voxel_resample(0.1, cache=True)
        counts_built = ds._vox[1][2].copy()
        ds2 = _dataset_from_arrays(tmp_path, [cloud], [cloud])
        ds2.enable_voxel_resample(0.1, cache=True)
        assert np.array_equal(ds2._vox[1][2], counts_built)
        assert np.array_equal(np.asarray(ds2._vox[1][0]),
                              np.asarray(ds._vox[1][0]))

    def test_labels_match_uniform_path(self, tmp_path):
        cloud = _cluster_cloud()
        ds = _dataset_from_arrays(tmp_path, [cloud], [cloud])
        rng = np.random.default_rng(1)
        a = ds.sample_batch([0], 32, rng, use_native=False)
        ds.enable_voxel_resample(0.1, cache=False)
        b = ds.sample_batch([0], 32, rng)
        for i in range(2, 8):
            assert np.array_equal(a[i], b[i])
