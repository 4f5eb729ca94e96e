"""Native C++ batch assembler: build, correctness vs source clouds,
distribution sanity, numpy-path equivalence of labels."""

import numpy as np
import pytest

from alignnet3d_tpu.data import native_loader


@pytest.fixture(scope="module")
def lib():
    lib = native_loader.get_lib()
    if lib is None:
        pytest.skip("no C++ toolchain / native build failed")
    return lib


def _ragged(rng, n_clouds=10, max_pts=300):
    counts = rng.integers(1, max_pts, n_clouds).astype(np.int64)
    counts[3] = 0  # one empty cloud
    offsets = np.zeros(n_clouds, np.int64)
    np.cumsum(counts[:-1], out=offsets[1:])
    flat = rng.normal(size=(int(counts.sum()), 3)).astype(np.float32)
    return flat, offsets, counts


def test_resample_gather_picks_from_correct_cloud(lib, rng):
    flat, offsets, counts = _ragged(rng)
    rows = np.array([0, 5, 9, 3], np.int64)
    out = native_loader.resample_gather(flat, offsets, counts, rows, 64, 42)
    assert out.shape == (4, 64, 3)
    for b, row in enumerate(rows):
        if counts[row] == 0:
            assert np.all(out[b] == 0)
            continue
        src = flat[offsets[row]: offsets[row] + counts[row]]
        d = np.linalg.norm(out[b][:, None] - src[None], axis=-1).min(1)
        assert d.max() == 0.0


def test_resample_distribution_uniform(lib, rng):
    """Across many draws every source point should appear with roughly
    uniform frequency."""
    flat = np.arange(30, dtype=np.float32).reshape(10, 3)
    offsets = np.array([0], np.int64)
    counts = np.array([10], np.int64)
    rows = np.zeros(200, np.int64)
    out = native_loader.resample_gather(flat, offsets, counts, rows, 100, 7)
    picked = out[..., 0].ravel() / 3.0  # recover source index from x coord
    hist = np.bincount(picked.astype(int), minlength=10)
    assert hist.min() > 0
    # 20000 draws over 10 bins: expect ~2000 each, allow wide slack
    assert hist.max() / hist.min() < 1.3


def test_seed_determinism(lib, rng):
    flat, offsets, counts = _ragged(rng)
    rows = np.array([1, 2], np.int64)
    a = native_loader.resample_gather(flat, offsets, counts, rows, 32, 99)
    b = native_loader.resample_gather(flat, offsets, counts, rows, 32, 99)
    c = native_loader.resample_gather(flat, offsets, counts, rows, 32, 100)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_gather_labels(lib, rng):
    labels = rng.normal(size=(20, 3))
    rows = np.array([3, 19, 0], np.int64)
    out = native_loader.gather_labels(labels, rows)
    np.testing.assert_allclose(out, labels[rows])


def test_packed_dataset_native_and_numpy_labels_agree(lib, tmp_path, rng):
    from alignnet3d_tpu.data.provider import PackedDataset
    from alignnet3d_tpu.data.synthetic import generate_dataset

    base = str(tmp_path / "ds")
    generate_dataset(base, num_train=6, num_val=2, seed=5, vres=12, hres=90)
    ds = PackedDataset(base)
    idxs = [0, 3, 7]
    nat = ds.sample_batch(idxs, 32, np.random.default_rng(0), use_native=True)
    npy = ds.sample_batch(idxs, 32, np.random.default_rng(0), use_native=False)
    for a, b in zip(nat[2:], npy[2:]):  # labels identical
        np.testing.assert_allclose(a, b)
    assert nat[0].shape == npy[0].shape


def test_packed_cache_meta_is_commit_marker(tmp_path, rng):
    """The meta npz is written LAST (atomic rename): a cache dir holding
    full-size point payloads but no meta npz (an interrupted pack/upgrade)
    must repack instead of silently loading stale/zero data."""
    import os

    from alignnet3d_tpu.data.provider import PACK_VERSION, PackedDataset
    from alignnet3d_tpu.data.synthetic import generate_dataset

    base = str(tmp_path / "ds")
    generate_dataset(base, num_train=4, num_val=2, seed=7, vres=12, hres=90)
    ds = PackedDataset(base)
    want = np.array(ds.points1[:8])
    meta_file = os.path.join(base, f"packed_v{PACK_VERSION}.npz")
    assert os.path.isfile(meta_file)
    # no tmp file left behind by the atomic write
    assert not os.path.isfile(meta_file + ".tmp.npz")
    # simulate an interrupted pack: meta gone, point payloads zeroed
    os.remove(meta_file)
    pts = os.path.join(base, f"packed_v{PACK_VERSION}_points1.npy")
    z = np.lib.format.open_memmap(pts, mode="r+")
    z[:] = 0.0
    z.flush()
    del z
    ds2 = PackedDataset(base)  # must repack, not trust the orphan payloads
    np.testing.assert_allclose(np.array(ds2.points1[:8]), want)
    assert os.path.isfile(meta_file)
