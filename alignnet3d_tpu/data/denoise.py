"""Clutter rejection: grid-connectivity component filter (framework
addition; no reference analogue — the reference's KITTI Hard configs
admit occluded/truncated tracklets, /root/reference/tp_utils/
pointcloud.py:623-642, but its box crop keeps any neighbor returns that
fall inside the tracklet box, and nothing downstream removes them).

Motivation (docs/RESULTS.md round-4 Hard table): on SynthCarsHard the
flagship's failures are angle-dominated (16.7 deg mean yaw) — the
leaked occluder cluster corrupts the canonicalization stages far more
than the occlusion/truncation holes do. The clutter is a DENSE second
cluster (a neighboring car's returns), which statistical outlier
removal cannot touch; single-linkage clustering can, and the cheap
deterministic approximation below is enough at LiDAR crop scale.

Algorithm (host-side numpy, same tier as the voxel-resample view):
points are hashed to a cubic grid at ``cell`` resolution; occupied
cells that touch in the 26-neighborhood are unioned; each point belongs
to its cell's component. This is single-linkage clustering at grid
resolution: points within ``cell`` of each other always share a
component, points farther than ``2*sqrt(3)*cell`` never do through an
empty gap. One component is kept:

  keep='largest'  most points — the classic choice; wrong when the
                  occluder (closer to the sensor, denser returns)
                  out-counts the target.
  keep='central'  component whose centroid is nearest the coordinate-
                  wise median of the full cloud — robust when the
                  target contributes the majority of points around the
                  crop center.

Conservative by construction: when clutter sits within ``cell`` of the
target surface the clusters merge and the filter is a no-op (it never
splits real geometry it cannot distinguish); when the target itself is
fragmented by occlusion shadows wider than ``cell``, smaller fragments
are lost — pick ``cell`` generously (default 0.5 m; car-to-car gaps
are usually larger, intra-car gaps smaller).
"""

from __future__ import annotations

import numpy as np

# half of the 26-neighborhood: lexicographically-positive offsets so each
# adjacent cell pair is unioned exactly once
_HALF_OFFSETS = np.array(
    [(a - 1, b - 1, c - 1) for a, b, c in np.ndindex(3, 3, 3)
     if (a - 1, b - 1, c - 1) > (0, 0, 0)],
    dtype=np.int64,
)


def _find(parent: np.ndarray, i: int) -> int:
    root = i
    while parent[root] != root:
        root = parent[root]
    while parent[i] != root:  # path compression
        parent[i], i = root, parent[i]
    return root


def grid_component_labels(points: np.ndarray, cell: float) -> np.ndarray:
    """Per-point component labels under grid connectivity at ``cell``.

    Returns an int64 array of root ids (arbitrary but consistent)."""
    pts = np.asarray(points, dtype=np.float64)
    cells = np.floor(pts[:, :3] / float(cell)).astype(np.int64)
    uniq, inv = np.unique(cells, axis=0, return_inverse=True)
    n = len(uniq)
    lut = {tuple(c): i for i, c in enumerate(uniq)}
    parent = np.arange(n, dtype=np.int64)
    for i, c in enumerate(uniq):
        for off in _HALF_OFFSETS:
            j = lut.get((c[0] + off[0], c[1] + off[1], c[2] + off[2]))
            if j is not None:
                ri, rj = _find(parent, i), _find(parent, j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
    roots = np.array([_find(parent, i) for i in range(n)], dtype=np.int64)
    return roots[inv]


def component_keep_mask(points: np.ndarray, cell: float = 0.5,
                        keep: str = "central") -> np.ndarray:
    """Boolean mask selecting the kept component's points.

    Empty and single-component clouds return all-True."""
    if keep not in ("largest", "central"):
        raise ValueError(f"keep must be 'largest' or 'central', got {keep!r}")
    pts = np.asarray(points, dtype=np.float64)
    m = len(pts)
    if m == 0:
        return np.ones(0, dtype=bool)
    labels = grid_component_labels(pts, cell)
    uniq, inv, counts = np.unique(labels, return_inverse=True,
                                  return_counts=True)
    if len(uniq) == 1:
        return np.ones(m, dtype=bool)
    if keep == "largest":
        target = int(np.argmax(counts))
    elif keep == "central":
        med = np.median(pts[:, :3], axis=0)
        cent = np.zeros((len(uniq), 3))
        np.add.at(cent, inv, pts[:, :3])
        cent /= counts[:, None]
        target = int(np.argmin(np.linalg.norm(cent - med, axis=1)))
    return inv == target


def component_filter_indices(points: np.ndarray, cloud_ids: np.ndarray,
                             cell: float, keep: str) -> np.ndarray:
    """Sorted indices of kept points for a CONCATENATED block of clouds
    (same calling convention as provider.voxel_dedup_indices, so the
    packed view builder can chunk whole clouds)."""
    pts = np.asarray(points, dtype=np.float32)
    ids = np.asarray(cloud_ids)
    out = []
    start = 0
    while start < len(ids):
        end = start
        while end < len(ids) and ids[end] == ids[start]:
            end += 1
        mask = component_keep_mask(pts[start:end], cell, keep)
        out.append(np.nonzero(mask)[0].astype(np.int64) + start)
        start = end
    if not out:
        return np.zeros(0, dtype=np.int64)
    return np.concatenate(out)
