"""Pallas TPU kernel: fused k-nearest-neighbors for the DGCNN graph.

The DGCNN graph build (reference utils/tf_util_dgcnn.py:638-671) is a
(B, N, N) pairwise-distance matrix immediately reduced by a top-k over
the last axis. Under XLA those are separate ops: the full distance
matrix round-trips through HBM (134 MB at B=128/N=512) and
``lax.top_k`` runs a sort-based reduction on the vector units —
measured 10.5 ms (exact) / 7.0 ms (``approx_max_k``) on v5e, the
dominant term of the DGCNN forward after the flat-gather fix
(scripts/bench_dgcnn.py).

This kernel computes each (TM, N) distance tile on the MXU and extracts
the exact top-k IN VMEM by k rounds of (min, argmin, mask) — the
distance matrix never leaves the chip. Ordering matches
``lax.top_k(neg_dist)`` exactly: ascending squared distance, ties to
the lower index (argmin semantics), self first (d2=0).

Layout notes (see /opt/skills/guides/pallas_guide.md):
- points are passed TRANSPOSED as (B, 3, N) so the 128-lane axis is the
  point axis; the cross term is one lax.dot_general (3, TM) x (3, N) ->
  (TM, N) f32 on the MXU;
- the per-round argmin/mask walk the (TM, N) tile with N on lanes —
  cross-lane min/argmin reductions, a where() against a column iota;
- output is written as (K, TM) tiles into a (B, K, N) array (K=20 pads
  the sublane axis to 24; putting K on lanes would pad 20 -> 128 and
  6x the output traffic), transposed to the caller's (B, N, K) by XLA;
- padded destination columns carry +inf in their |b|^2 row and can
  never win a round.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _knn_kernel(pts_ref, sq_ref, out_ref, *, k: int, tm: int):
    """One grid step: top-k over the whole point set for a (tm,) strip."""
    n = pts_ref.shape[2]
    i = pl.program_id(1)
    dst = pts_ref[0]                       # (3, n)
    src = pts_ref[0, :, pl.ds(i * tm, tm)]  # (3, tm)
    dst_sq = sq_ref[0]                     # (1, n); +inf on padded columns
    src_sq = jnp.sum(src * src, axis=0)    # (tm,)

    cross = jax.lax.dot_general(
        src, dst, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                      # (tm, n)
    d2 = src_sq[:, None] - 2.0 * cross + dst_sq
    col = jax.lax.broadcasted_iota(jnp.int32, (tm, n), 1)

    for t in range(k):
        best = jnp.argmin(d2, axis=1).astype(jnp.int32)   # ties -> lower idx
        out_ref[0, t, :] = best
        d2 = jnp.where(col == best[:, None], jnp.inf, d2)


@partial(jax.jit, static_argnames=("k", "tm", "interpret"))
def knn_points_pallas(points: jax.Array, k: int = 20, tm: int = 128,
                      interpret: bool | None = None) -> jax.Array:
    """Exact k-NN indices from raw points: (B, N, 3) -> (B, N, k) int32.

    Drop-in for ``knn(pairwise_distance(points), k)`` (ops/knn.py);
    equality is tested in tests/test_knn_kernels.py (interpret) and
    on-chip by scripts/onchip_smoke.py. Clouds of any N are padded to
    the tile grid internally.

    tm=128 is the measured v5e sweet spot at the DGCNN train shape
    (B=128 N=512 k=20): 5.6 ms vs 10.6 (tm=512) / 11.7 (tm=256) / 9.7
    (XLA exact top_k) / 7.1 (approx_max_k) — scripts/bench_dgcnn.py
    tile sweep, 2026-08-18 on-chip run. Smaller strips keep the k
    argmin rounds on a (128, N) tile whose per-round latency the
    next strip's MXU matmul can hide.
    """
    b, n, _ = points.shape
    assert k <= n, (k, n)
    assert tm % 128 == 0, f"tm must be a lane multiple (got {tm})"
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    np_ = _round_up(n, 128)
    tm = min(tm, np_)
    np_ = _round_up(n, tm)

    pts_t = jnp.transpose(points.astype(jnp.float32), (0, 2, 1))
    pts_t = jnp.pad(pts_t, ((0, 0), (0, 0), (0, np_ - n)))
    sq = jnp.sum(pts_t * pts_t, axis=1, keepdims=True)     # (B, 1, np_)
    if np_ > n:
        lane = jnp.arange(np_)
        sq = jnp.where(lane[None, None, :] < n, sq, jnp.inf)

    idx = pl.pallas_call(
        partial(_knn_kernel, k=k, tm=tm),
        grid=(b, np_ // tm),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((1, 3, np_), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, np_), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, k, tm), lambda bi, i: (bi, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, k, np_), jnp.int32),
    )(pts_t, sq)
    return jnp.transpose(idx, (0, 2, 1))[:, :n, :]
