"""Data provider: reference-compatible on-disk format + a packed fast path.

On-disk layout (reference README.md:50-69, provider.py:85-136):

    <basepath>/meta/%08d.json         translation/rel_angle/start+end pose
    <basepath>/pointcloud1/%08d.npy   (Ni, 3+) float points
    <basepath>/pointcloud2/%08d.npy
    <basepath>/split/{train,val}.txt  integer indices

The reference reads per-sample JSON + npy synchronously inside the train
loop (SURVEY.md §3.1 hot loop) — the #1 host bottleneck. Here a
``PackedDataset`` packs a whole split into flat ragged arrays once (cached
as a single .npz next to the dataset), after which a batch is two vectorized
gathers; resampling-with-replacement and jitter match reference
provider.py:60-71, 97-98 statistically.
"""

from __future__ import annotations

import json
import logging
import os
import threading
import time
import queue as queue_mod

import numpy as np

from alignnet3d_tpu.geometry import str_to_np

logger = logging.getLogger("alignnet3d_tpu")

# v2: labels/counts/metas in packed_v2.npz + standalone packed_v2_points{k}
# .npy per cloud array, loaded via mmap (npz members can't be memory-mapped);
# an existing v1 monolithic cache is upgraded in place on first open
PACK_VERSION = 2


def getDataFiles(list_filename: str):
    """Read split indices (reference provider.py:74-75)."""
    with open(list_filename) as f:
        return [int(line.rstrip()) for line in f if line.strip()]


def shuffle_data(data, labels, rng=None):
    """Shuffle data/labels together; returns (data, labels, idx)
    (reference provider.py:10-20)."""
    if rng is None:
        rng = np.random.default_rng()
    idx = rng.permutation(len(labels))
    return data[idx, ...], labels[idx], idx


def rotate_point_cloud(batch_data, rng=None):
    """Random per-cloud rotation about the up direction — NOTE the
    reference rotates about the Y axis here (provider.py:23-39, a ModelNet
    convention; unused by the training flow). Kept verbatim."""
    if rng is None:
        rng = np.random.default_rng()
    out = np.zeros_like(batch_data, dtype=np.float32)
    for k in range(batch_data.shape[0]):
        angle = rng.uniform() * 2 * np.pi
        c, s = np.cos(angle), np.sin(angle)
        rot = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        out[k] = batch_data[k].reshape(-1, 3) @ rot
    return out


def rotate_point_cloud_by_angle(batch_data, rotation_angle):
    """Fixed-angle variant of the above (reference provider.py:42-57)."""
    c, s = np.cos(rotation_angle), np.sin(rotation_angle)
    rot = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    return np.einsum("bnd,de->bne", np.asarray(batch_data, np.float64), rot)


def jitter_point_cloud(batch_data, sigma=0.01, clip=0.05, rng=None):
    """Per-point gaussian jitter, clipped (reference provider.py:60-71)."""
    if rng is None:
        rng = np.random.default_rng()
    noise = np.clip(sigma * rng.standard_normal(batch_data.shape), -clip, clip)
    return batch_data + noise


def load_meta(basepath: str, idx: int) -> dict:
    with open(f"{basepath}/meta/{str(idx).zfill(8)}.json") as f:
        return json.load(f)


def parse_meta_labels(meta: dict):
    """Extract the 6 label arrays from a meta dict (provider.py:86-89)."""
    translation = str_to_np(meta["translation"])
    rel_angle = meta["rel_angle"]
    pc1center = str_to_np(meta["start_position"])
    pc2center = str_to_np(meta["end_position"])
    pc1angle = meta["start_angle"]
    pc2angle = meta["end_angle"]
    return translation, rel_angle, pc1center, pc2center, pc1angle, pc2angle


def load_from_separate_files(cfg, idx: int, dont_load_pointclouds=False,
                             rng=None):
    """Single-sample loader (reference provider.py:85-105): meta labels plus
    the two clouds resampled with replacement to ``cfg.model.num_points``."""
    labels = parse_meta_labels(load_meta(cfg.data.basepath, idx))
    if dont_load_pointclouds:
        return labels
    rng = rng or np.random
    num_points = cfg.model.num_points
    out_pcs = []
    for name in ("pointcloud1", "pointcloud2"):
        pc = np.load(f"{cfg.data.basepath}/{name}/{str(idx).zfill(8)}.npy")
        if pc.shape[0] == 0:
            logger.error(f"Empty pointcloud! {idx}")
            out_pcs.append(np.zeros((num_points, 3), dtype=np.float32))
        else:
            choice = rng.choice(pc.shape[0], num_points, replace=True)
            out_pcs.append(np.asarray(pc[choice, :3], dtype=np.float32))
    return (*out_pcs, *labels)


def load_batch(cfg, indices, override_batch_size=None,
               dont_load_pointclouds=False, rng=None):
    """Reference-compatible batch loader (provider.py:108-136)."""
    batch_size = (
        cfg.training.batch_size if override_batch_size is None
        else override_batch_size
    )
    num_points = cfg.model.num_points
    nch = cfg.data.num_channels
    pcs1 = np.empty((batch_size, num_points, nch))
    pcs2 = np.empty((batch_size, num_points, nch))
    translations = np.empty((batch_size, 3))
    rel_angles = np.empty((batch_size, 1))
    pc1centers = np.empty((batch_size, 3))
    pc2centers = np.empty((batch_size, 3))
    pc1angles = np.empty((batch_size, 1))
    pc2angles = np.empty((batch_size, 1))

    for i, ex_idx in enumerate(indices):
        sample = load_from_separate_files(
            cfg, ex_idx, dont_load_pointclouds=dont_load_pointclouds, rng=rng
        )
        if dont_load_pointclouds:
            t, ra, c1, c2, a1, a2 = sample
        else:
            pc1, pc2, t, ra, c1, c2, a1, a2 = sample
            pcs1[i] = pc1[:, :3]
            pcs2[i] = pc2[:, :3]
        translations[i] = t
        rel_angles[i] = ra
        pc1centers[i] = c1
        pc2centers[i] = c2
        pc1angles[i] = a1
        pc2angles[i] = a2
    return (pcs1, pcs2, translations, rel_angles, pc1centers, pc2centers,
            pc1angles, pc2angles)


def voxel_dedup_indices(points, cloud_ids, voxel_size: float):
    """Sorted indices of one representative point per (cloud, voxel).

    The SINGLE implementation of the voxel-dedup semantics, shared by the
    training-side view (PackedDataset.enable_voxel_resample) and the
    serving Aligner (api.py voxel_resample) so train/serve quantization
    can never drift.
    """
    pts = np.asarray(points, dtype=np.float32)
    keys = np.empty((len(pts), 4), dtype=np.int64)
    keys[:, 0] = cloud_ids
    keys[:, 1:] = np.floor(pts[:, :3] / float(voxel_size)).astype(np.int64)
    _, first = np.unique(keys, axis=0, return_index=True)
    first.sort()
    return first


# --------------------------------------------------------------- packed path


class PackedDataset:
    """A dataset split packed into flat ragged arrays for fast batching.

    Packs every sample index of the dataset once (cached in
    ``<basepath>/packed_v{N}.npz``); afterwards ``sample_batch`` does
    resample-with-replacement + label stacking as a handful of vectorized
    gathers — no per-sample file IO on the training hot path.
    """

    def __init__(self, basepath: str, indices=None, cache: bool = True,
                 mmap: bool = True):
        self.basepath = basepath
        self._vox = None
        all_indices = self._discover_indices(basepath)
        meta_file = os.path.join(basepath, f"packed_v{PACK_VERSION}.npz")
        point_files = {
            k: os.path.join(basepath, f"packed_v{PACK_VERSION}_points{k}.npy")
            for k in (1, 2)
        }
        v1_file = os.path.join(basepath, "packed_v1.npz")
        if cache:
            self._load_or_build_cache(basepath, all_indices, meta_file,
                                      point_files, v1_file, mmap)
        else:
            self._init_from_arrays(self._pack(basepath, all_indices))
        self.index_map = {int(v): i for i, v in enumerate(self.indices)}
        if indices is not None:
            missing = [i for i in indices if int(i) not in self.index_map]
            assert not missing, f"indices missing from dataset: {missing[:10]}"

    # ------------------------------------------------------------ cache IO

    @staticmethod
    def _cache_complete(meta_file, point_files):
        return os.path.isfile(meta_file) and all(
            os.path.isfile(p) for p in point_files.values()
        )

    def _load_cache(self, meta_file, point_files, mmap):
        # v2 cache: small npz for labels/counts/metas + standalone .npy
        # per points array, memory-mapped — instant startup and no
        # double-resident copy at 40k+ scenes (VERDICT r2 weak #5)
        data = np.load(meta_file)
        arrays = {k: data[k] for k in data.files}
        for k in (1, 2):
            arrays[f"points{k}"] = np.load(
                point_files[k], mmap_mode="r" if mmap else None
            )
        self._init_from_arrays(arrays)

    @staticmethod
    def _lock_stale(lock_file, max_age_s=6 * 3600):
        """A pack lock is stale when its owner pid is dead or it has sat
        for longer than any plausible pack (guards against a packer killed
        without cleanup — supervisor timeouts, OOM kills)."""
        try:
            pid_txt = open(lock_file).read().strip()
            if pid_txt:
                os.kill(int(pid_txt), 0)  # raises if the owner is gone
            elif time.time() - os.path.getmtime(lock_file) < 10.0:
                return False  # owner may still be mid-write of its pid
            else:
                return True
            return time.time() - os.path.getmtime(lock_file) > max_age_s
        except (OSError, ValueError):
            return True

    def _load_or_build_cache(self, basepath, all_indices, meta_file,
                             point_files, v1_file, mmap,
                             wait_timeout_s=2 * 3600):
        """Load the packed cache, electing exactly ONE packer per dataset
        dir when it is missing. Concurrent openers (multihost dryrun
        workers, a tune script racing training) previously both ran
        open_memmap('w+') on the shared points files — truncating pages
        the other had mapped — and raced os.replace on one tmp path; now
        losers of an O_EXCL lockfile wait for the commit marker instead."""
        lock_file = meta_file + ".lock"
        deadline = time.time() + wait_timeout_s
        while True:
            if self._cache_complete(meta_file, point_files):
                self._load_cache(meta_file, point_files, mmap)
                return
            fd = None
            try:
                fd = os.open(lock_file,
                             os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(fd, str(os.getpid()).encode())
            except FileExistsError:
                if self._lock_stale(lock_file):
                    try:
                        os.remove(lock_file)
                    except OSError:
                        pass
                    continue
                if time.time() > deadline:
                    raise TimeoutError(
                        f"timed out waiting for packed cache {meta_file} "
                        f"(lock {lock_file} held by another process)"
                    )
                time.sleep(1.0)
                continue
            except OSError:
                # unwritable dataset dir: nothing else can be writing the
                # cache here either; pack locklessly (the spill path in
                # _pack_streaming handles read-only dirs)
                fd = None
            try:
                # double-check: the previous holder may have committed
                # between our completeness check and lock acquisition
                if self._cache_complete(meta_file, point_files):
                    self._load_cache(meta_file, point_files, mmap)
                elif os.path.isfile(v1_file):
                    # upgrade an existing v1 monolithic cache in place
                    data = np.load(v1_file)
                    arrays = {k: data[k] for k in data.files}
                    self._init_from_arrays(arrays)
                    try:
                        self._write_cache(meta_file, point_files, arrays)
                        for k in (1, 2):
                            setattr(self, f"points{k}", np.load(
                                point_files[k],
                                mmap_mode="r" if mmap else None,
                            ))
                    except OSError as e:
                        logger.warning(f"could not upgrade packed cache: {e}")
                else:
                    self._pack_streaming(basepath, all_indices, meta_file,
                                         point_files, mmap=mmap)
                return
            finally:
                if fd is not None:
                    os.close(fd)
                    try:
                        os.remove(lock_file)
                    except OSError:
                        pass

    @staticmethod
    def _savez_atomic(meta_file, small):
        """Write the meta npz via temp + rename. The meta npz is the cache
        COMMIT MARKER (written last): a process killed mid-write (the
        supervisor's timeout loop, OOM kills) must not leave a
        complete-looking cache that later opens load silently. The tmp
        name is pid-unique so two uncoordinated writers can never splice
        halves of each other's file."""
        tmp = f"{meta_file}.tmp.{os.getpid()}.npz"
        np.savez(tmp, **small)
        os.replace(tmp, meta_file)

    @classmethod
    def _write_cache(cls, meta_file, point_files, arrays):
        # points first, meta npz last: open_memmap creates full-size files
        # immediately, so the meta file's existence is the only reliable
        # "cache complete" signal the cache-hit check can key on
        for k in (1, 2):
            pts = np.ascontiguousarray(
                np.asarray(arrays[f"points{k}"], np.float32)
            )
            out = np.lib.format.open_memmap(
                point_files[k], mode="w+", dtype=np.float32, shape=pts.shape
            )
            out[:] = pts
            out.flush()
            del out
        small = {k: v for k, v in arrays.items()
                 if not k.startswith("points")}
        cls._savez_atomic(meta_file, small)

    def _pack_streaming(self, basepath, indices, meta_file, point_files,
                        mmap=True):
        """Two-pass pack straight into the on-disk cache: pass 1 reads only
        npy HEADERS for per-sample counts, pass 2 streams cloud data into a
        pre-allocated memmap — peak RAM stays at one sample regardless of
        dataset size (VERDICT r2 weak #5: the v1 pack held 2x the dataset
        in RAM while building)."""
        counts = {1: [], 2: []}
        for idx in indices:
            for k in (1, 2):
                hdr = np.load(
                    f"{basepath}/pointcloud{k}/{str(idx).zfill(8)}.npy",
                    mmap_mode="r",
                )
                counts[k].append(hdr.shape[0])
        totals = {k: int(np.sum(counts[k], dtype=np.int64)) for k in (1, 2)}
        try:
            outs = {
                k: np.lib.format.open_memmap(
                    point_files[k], mode="w+", dtype=np.float32,
                    shape=(totals[k], 3),
                )
                for k in (1, 2)
            }
            spill = False
        except OSError as e:  # read-only dataset dir: pack in RAM
            logger.warning(f"could not cache packed dataset: {e}")
            outs = {k: np.empty((totals[k], 3), np.float32) for k in (1, 2)}
            spill = True
        labels = {
            "translations": [], "rel_angles": [], "pc1centers": [],
            "pc2centers": [], "pc1angles": [], "pc2angles": [],
        }
        metas = []
        pos = {1: 0, 2: 0}
        for idx in indices:
            meta = load_meta(basepath, idx)
            metas.append(json.dumps(meta))
            t, ra, c1, c2, a1, a2 = parse_meta_labels(meta)
            labels["translations"].append(t)
            labels["rel_angles"].append([ra])
            labels["pc1centers"].append(c1)
            labels["pc2centers"].append(c2)
            labels["pc1angles"].append([a1])
            labels["pc2angles"].append([a2])
            for k in (1, 2):
                pc = np.load(
                    f"{basepath}/pointcloud{k}/{str(idx).zfill(8)}.npy"
                )
                n = pc.shape[0]
                outs[k][pos[k]:pos[k] + n] = pc[:, :3]
                pos[k] += n
        arrays = {
            "indices": np.asarray(indices, dtype=np.int64),
            "metas": np.asarray(metas),
        }
        for k in (1, 2):
            arrays[f"counts{k}"] = np.asarray(counts[k], dtype=np.int64)
            arrays[f"points{k}"] = outs[k]
        for name, vals in labels.items():
            arrays[name] = np.asarray(vals, dtype=np.float64)
        if not spill:
            small = {k: v for k, v in arrays.items()
                     if not k.startswith("points")}
            for k in (1, 2):
                outs[k].flush()
            try:
                self._savez_atomic(meta_file, small)
            except OSError as e:
                logger.warning(f"could not cache packed dataset: {e}")
            if not mmap:
                for k in (1, 2):
                    arrays[f"points{k}"] = np.asarray(outs[k])
        self._init_from_arrays(arrays)

    @staticmethod
    def _discover_indices(basepath):
        metas = sorted(os.listdir(os.path.join(basepath, "meta")))
        return [int(m[:-5]) for m in metas if m.endswith(".json")]

    @staticmethod
    def _pack(basepath, indices):
        points = {1: [], 2: []}
        counts = {1: [], 2: []}
        labels = {
            "translations": [], "rel_angles": [], "pc1centers": [],
            "pc2centers": [], "pc1angles": [], "pc2angles": [],
        }
        metas = []
        for idx in indices:
            meta = load_meta(basepath, idx)
            metas.append(json.dumps(meta))
            t, ra, c1, c2, a1, a2 = parse_meta_labels(meta)
            labels["translations"].append(t)
            labels["rel_angles"].append([ra])
            labels["pc1centers"].append(c1)
            labels["pc2centers"].append(c2)
            labels["pc1angles"].append([a1])
            labels["pc2angles"].append([a2])
            for k in (1, 2):
                pc = np.load(
                    f"{basepath}/pointcloud{k}/{str(idx).zfill(8)}.npy"
                )
                pc = np.asarray(pc[:, :3], dtype=np.float32)
                points[k].append(pc)
                counts[k].append(pc.shape[0])
        arrays = {
            "indices": np.asarray(indices, dtype=np.int64),
            "metas": np.asarray(metas),  # unicode array, picklable-free
        }
        for k in (1, 2):
            arrays[f"points{k}"] = (
                np.concatenate(points[k], axis=0)
                if points[k]
                else np.zeros((0, 3), np.float32)
            )
            arrays[f"counts{k}"] = np.asarray(counts[k], dtype=np.int64)
        for name, vals in labels.items():
            arrays[name] = np.asarray(vals, dtype=np.float64)
        return arrays

    def _init_from_arrays(self, arrays):
        self.indices = np.asarray(arrays["indices"], dtype=np.int64)
        self.metas_json = arrays["metas"]
        for k in (1, 2):
            setattr(self, f"points{k}", np.asarray(arrays[f"points{k}"]))
            counts = np.asarray(arrays[f"counts{k}"], dtype=np.int64)
            setattr(self, f"counts{k}", counts)
            offsets = np.zeros(len(counts) + 1, dtype=np.int64)
            np.cumsum(counts, out=offsets[1:])
            setattr(self, f"offsets{k}", offsets)
        for name in ("translations", "rel_angles", "pc1centers", "pc2centers",
                     "pc1angles", "pc2angles"):
            setattr(self, name, np.asarray(arrays[name], dtype=np.float64))

    def __len__(self):
        return len(self.indices)

    # --------------------------------------------- component clutter filter

    def enable_component_filter(self, cell: float = 0.5,
                                keep: str = "central", cache: bool = True):
        """Clutter rejection view (framework addition, data/denoise.py):
        replaces each cloud with its kept grid-connectivity component, so
        every downstream consumer (uniform resample, voxel view, batch
        assembly) sees the filtered geometry. Config: ``data.denoise =
        {"cell": 0.5, "keep": "central"|"largest"}``. Must be enabled
        BEFORE enable_voxel_resample; the voxel cache stem then carries a
        denoise suffix so filtered/unfiltered caches never collide."""
        from alignnet3d_tpu.data.denoise import component_filter_indices

        assert self._vox is None, "enable_component_filter before voxel view"
        cell = float(cell)
        for k in (1, 2):
            counts = np.asarray(getattr(self, f"counts{k}"))
            offsets = np.asarray(getattr(self, f"offsets{k}"))
            pts = getattr(self, f"points{k}")
            stem = os.path.join(
                self.basepath,
                f"packed_v{PACK_VERSION}_dn{k}_{cell:g}{keep[0]}")
            pfile, mfile = f"{stem}_points.npy", f"{stem}_meta.npz"
            if cache and os.path.isfile(pfile) and os.path.isfile(mfile):
                meta = np.load(mfile)
                new_counts = meta["counts"]
                new_pts = np.load(pfile, mmap_mode="r")
                if (len(new_counts) == len(counts)
                        and int(meta["parent_total"]) == len(pts)
                        and int(new_counts.sum()) == len(new_pts)):
                    self._set_parent_arrays(k, new_pts, new_counts)
                    continue
            n_clouds = len(counts)
            kept_all, new_counts = [], np.zeros(n_clouds, dtype=np.int64)
            chunk = 4_000_000
            start = 0
            while start < n_clouds:
                end, npts = start, 0
                while end < n_clouds and (npts == 0
                                          or npts + counts[end] <= chunk):
                    npts += int(counts[end])
                    end += 1
                lo, hi = int(offsets[start]), int(offsets[end])
                if hi > lo:
                    block = np.asarray(pts[lo:hi], dtype=np.float32)
                    cid = np.repeat(np.arange(start, end, dtype=np.int64),
                                    counts[start:end])
                    kept = component_filter_indices(block, cid, cell, keep)
                    kept_all.append(kept + lo)
                    new_counts[start:end] = np.bincount(
                        cid[kept] - start, minlength=end - start)
                start = end
            kept_idx = (np.concatenate(kept_all) if kept_all
                        else np.zeros(0, dtype=np.int64))
            new_pts = np.asarray(pts, dtype=np.float32)[kept_idx] \
                if len(kept_idx) else np.zeros((0, 3), np.float32)
            if cache:
                try:
                    tmp = f"{pfile}.tmp.{os.getpid()}.npy"
                    np.save(tmp[:-4], new_pts)
                    os.replace(tmp, pfile)
                    self._savez_atomic(mfile, {
                        "counts": new_counts,
                        "parent_total": np.int64(len(pts)),
                    })
                except OSError:
                    pass  # read-only dir: filtered view stays in RAM
            self._set_parent_arrays(k, new_pts, new_counts)
        self._denoise_tag = f"dn{cell:g}{keep[0]}"

    def _set_parent_arrays(self, k: int, pts, counts):
        offsets = np.zeros(len(counts) + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])
        setattr(self, f"points{k}", pts)
        setattr(self, f"counts{k}", np.asarray(counts, dtype=np.int64))
        setattr(self, f"offsets{k}", offsets)

    # ------------------------------------------------- voxel resample view

    def enable_voxel_resample(self, voxel_size: float, cache: bool = True):
        """Density-equalized resampling (framework addition; the reference
        only has uniform resample-with-replacement, provider.py:97-98).

        Beam-model scans are quadratically denser on near surfaces: a <5 m
        car carries ~4,400 points vs ~200 at 20 m, and uniform resampling
        then concentrates the kept ``num_points`` on the nearest panel,
        biasing the visible centroid differently in the two frames (round-3
        error-structure study: <5 m pairs score 58 % <20 cm vs ~92 % at
        10-20 m, scripts/analyze_error_structure.py). This materializes a
        one-point-per-voxel copy of each cloud ONCE (cached next to the
        packed arrays) and makes ``sample_batch`` draw uniformly over the
        deduped copy — approximately uniform over surface area, through
        the same native fast path as the uniform default. Far sparse
        clouds (spacing > voxel) are untouched.
        """
        views = {}
        for k in (1, 2):
            vpts, vcounts = self._voxel_view(k, float(voxel_size), cache)
            offsets = np.zeros(len(vcounts) + 1, dtype=np.int64)
            np.cumsum(vcounts, out=offsets[1:])
            views[k] = (vpts, offsets, vcounts)
        self._vox = views
        self._vox_size = float(voxel_size)

    def _vox_cache_files(self, k: int, voxel_size: float):
        # the component filter rewrites the parent arrays, so its voxel
        # view must cache under a distinct stem
        dn = getattr(self, "_denoise_tag", None)
        suffix = f"_{dn}" if dn else ""
        stem = os.path.join(
            self.basepath,
            f"packed_v{PACK_VERSION}_vox{k}_{voxel_size:g}{suffix}",
        )
        return f"{stem}_points.npy", f"{stem}_meta.npz"

    def _load_voxel_cache(self, k, points_file, meta_file):
        """Load + validate a cached voxel view against the CURRENT parent
        arrays; returns None when stale (dataset rebuilt in place)."""
        meta = np.load(meta_file)
        counts = meta["counts"]
        vpts = np.load(points_file, mmap_mode="r")
        parent = getattr(self, f"counts{k}")
        if (len(counts) == len(parent)
                and int(meta["parent_total"]) == len(
                    getattr(self, f"points{k}"))
                and int(counts.sum()) == len(vpts)):
            return vpts, counts
        return None

    def _voxel_view(self, k: int, voxel_size: float, cache: bool,
                    wait_timeout_s=2 * 3600):
        points_file, meta_file = self._vox_cache_files(k, voxel_size)
        if not cache:
            return self._build_voxel_view(k, voxel_size, points_file=None)
        # single-builder election, same discipline as the packed cache:
        # the meta npz is the commit marker, losers wait on it
        lock_file = meta_file + ".lock"
        deadline = time.time() + wait_timeout_s
        while True:
            if os.path.isfile(meta_file) and os.path.isfile(points_file):
                loaded = self._load_voxel_cache(k, points_file, meta_file)
                if loaded is not None:
                    return loaded
            fd = None
            try:
                fd = os.open(lock_file,
                             os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(fd, str(os.getpid()).encode())
            except FileExistsError:
                if self._lock_stale(lock_file):
                    try:
                        os.remove(lock_file)
                    except OSError:
                        pass
                    continue
                if time.time() > deadline:
                    raise TimeoutError(
                        f"timed out waiting for voxel cache {meta_file}"
                    )
                time.sleep(1.0)
                continue
            except OSError:
                fd = None  # unwritable dir: build without caching
                return self._build_voxel_view(k, voxel_size,
                                              points_file=None)
            try:
                if os.path.isfile(meta_file) and os.path.isfile(points_file):
                    loaded = self._load_voxel_cache(
                        k, points_file, meta_file)
                    if loaded is not None:
                        return loaded
                vpts, counts = self._build_voxel_view(
                    k, voxel_size, points_file=points_file)
                self._savez_atomic(meta_file, {
                    "counts": counts,
                    "parent_total": np.int64(
                        len(getattr(self, f"points{k}"))),
                })
                return vpts, counts
            finally:
                if fd is not None:
                    os.close(fd)
                    try:
                        os.remove(lock_file)
                    except OSError:
                        pass

    def _build_voxel_view(self, k: int, voxel_size: float,
                          points_file, chunk_points: int = 4_000_000):
        """Materialize one representative point per occupied voxel per
        cloud, in bounded-memory chunks of whole clouds. Writes straight
        into a memmap at ``points_file`` (pid-unique tmp + rename) when
        given, else returns an in-RAM array."""
        counts = np.asarray(getattr(self, f"counts{k}"))
        offsets = np.asarray(getattr(self, f"offsets{k}"))
        pts = getattr(self, f"points{k}")
        n_clouds = len(counts)
        kept_parts = []
        vox_counts = np.zeros(n_clouds, dtype=np.int64)
        start = 0
        while start < n_clouds:
            end, npts = start, 0
            while end < n_clouds and (npts == 0
                                      or npts + counts[end] <= chunk_points):
                npts += int(counts[end])
                end += 1
            lo, hi = int(offsets[start]), int(offsets[end])
            if hi > lo:
                block = np.asarray(pts[lo:hi], dtype=np.float32)
                cid = np.repeat(np.arange(start, end, dtype=np.int64),
                                counts[start:end])
                first = voxel_dedup_indices(block, cid, voxel_size)
                kept_parts.append(first.astype(np.int64) + lo)
                vox_counts[start:end] = np.bincount(
                    cid[first] - start, minlength=end - start
                )
            start = end
        total = int(vox_counts.sum())
        if points_file is not None:
            from numpy.lib.format import open_memmap

            tmp = f"{points_file}.tmp.{os.getpid()}.npy"
            out = open_memmap(tmp, mode="w+", dtype=np.float32,
                              shape=(total, 3))
        else:
            out = np.empty((total, 3), dtype=np.float32)
        pos = 0
        for kept in kept_parts:
            out[pos:pos + len(kept)] = pts[kept]
            pos += len(kept)
        if points_file is not None:
            out.flush()
            del out
            os.replace(tmp, points_file)
            out = np.load(points_file, mmap_mode="r")
        return out, vox_counts

    @staticmethod
    def shard_indices(indices, host_id: int, num_hosts: int):
        """Static per-host split of a set of file indices for pod-scale
        multi-process data loading: host k takes every num_hosts-th index.
        Each process then builds batches only for its own shard; the global
        batch is assembled by the runtime via dp sharding over DCN.
        """
        return list(indices)[host_id::num_hosts]

    def rows(self, file_indices):
        """Map dataset file indices -> packed row numbers."""
        return np.asarray(
            [self.index_map[int(i)] for i in np.asarray(file_indices).ravel()],
            dtype=np.int64,
        )

    def metas(self, file_indices):
        rows = self.rows(file_indices)
        return [json.loads(self.metas_json[r]) for r in rows]

    def sample_batch(self, file_indices, num_points: int,
                     rng: np.random.Generator, use_native: bool = True):
        """Batch assembly with per-cloud resample-with-replacement
        (statistical equivalent of reference provider.py:97-98; empty clouds
        become zeros as in provider.py:95-96).

        Uses the native C++ assembler (native/loader.cpp) when available,
        falling back to vectorized numpy. Both paths draw from the same
        distribution; the streams differ.
        """
        rows = self.rows(file_indices)
        b = len(rows)
        if self._vox is not None:
            # density-equalized copy (enable_voxel_resample): the deduped
            # flat points use the SAME layout as the uniform arrays, so
            # the native fast path applies unchanged
            if use_native:
                from alignnet3d_tpu.data import native_loader

                seeds = rng.integers(0, 2 ** 63, 2)
                pcs = [
                    native_loader.resample_gather(
                        self._vox[k][0], self._vox[k][1], self._vox[k][2],
                        rows, num_points, int(seeds[k - 1]),
                    )
                    for k in (1, 2)
                ]
            else:
                pcs = [None, None]
            out = []
            for k, native_pc in zip((1, 2), pcs):
                if native_pc is not None:
                    out.append(native_pc)
                    continue
                vpts, voffs, vcounts = self._vox[k]
                counts = vcounts[rows]
                offsets = voffs[rows]
                safe_counts = np.maximum(counts, 1)
                pick = (
                    rng.random((b, num_points)) * safe_counts[:, None]
                ).astype(np.int64)
                if len(vpts) == 0:
                    out.append(np.zeros((b, num_points, 3), np.float32))
                    continue
                # clamp like api._resample: empty clouds gather index 0
                # and are zeroed below
                gather = np.minimum(offsets[:, None] + pick, len(vpts) - 1)
                pts = np.asarray(vpts)[gather]
                pts = np.where(counts[:, None, None] > 0, pts, 0.0)
                out.append(np.ascontiguousarray(pts, dtype=np.float32))
            labels = (
                self.translations[rows],
                self.rel_angles[rows],
                self.pc1centers[rows],
                self.pc2centers[rows],
                self.pc1angles[rows],
                self.pc2angles[rows],
            )
            return (*out, *[np.asarray(v) for v in labels])
        if use_native:
            from alignnet3d_tpu.data import native_loader

            seeds = rng.integers(0, 2 ** 63, 2)
            pcs = [
                native_loader.resample_gather(
                    getattr(self, f"points{k}"),
                    getattr(self, f"offsets{k}"),
                    getattr(self, f"counts{k}"),
                    rows, num_points, int(seeds[k - 1]),
                )
                for k in (1, 2)
            ]
            if all(p is not None for p in pcs):
                labels = (
                    self.translations[rows],
                    self.rel_angles[rows],
                    self.pc1centers[rows],
                    self.pc2centers[rows],
                    self.pc1angles[rows],
                    self.pc2angles[rows],
                )
                return (*pcs, *[np.asarray(v) for v in labels])
        out = []
        for k in (1, 2):
            counts = getattr(self, f"counts{k}")[rows]  # (B,)
            offsets = getattr(self, f"offsets{k}")[rows]
            safe_counts = np.maximum(counts, 1)
            pick = (
                rng.random((b, num_points)) * safe_counts[:, None]
            ).astype(np.int64)
            flat_idx = offsets[:, None] + pick
            pts = getattr(self, f"points{k}")[flat_idx]  # (B, N, 3)
            pts = np.where(counts[:, None, None] > 0, pts, 0.0)
            out.append(np.ascontiguousarray(pts, dtype=np.float32))
        labels = (
            self.translations[rows],
            self.rel_angles[rows],
            self.pc1centers[rows],
            self.pc2centers[rows],
            self.pc1angles[rows],
            self.pc2angles[rows],
        )
        return (*out, *[np.asarray(v) for v in labels])


class PrefetchIterator:
    """Background-thread batch prefetcher over a PackedDataset.

    The reference loads batches synchronously in the step loop
    (train.py:352); this overlaps host batch assembly with device compute.
    """

    def __init__(self, make_batch, num_batches: int, prefetch: int = 2):
        self._queue: queue_mod.Queue = queue_mod.Queue(maxsize=max(1, prefetch))
        self._num_batches = num_batches
        self._error = None

        def worker():
            try:
                for i in range(num_batches):
                    self._queue.put(make_batch(i))
            except BaseException as e:  # surfaced on next()
                self._error = e
            finally:
                self._queue.put(None)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __len__(self):
        return self._num_batches

    def __next__(self):
        item = self._queue.get()
        if item is None:
            if self._error is not None:
                raise self._error
            raise StopIteration
        return item
