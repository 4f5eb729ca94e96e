"""Pallas TPU kernel: fused brute-force nearest-neighbor argmin.

The hot op of batched ICP (icp/p2point.py:_nn_correspondences) is, for
each source point, the index + distance of the nearest destination
point: an (n1, n2) squared-distance matrix immediately reduced by
argmin over n2. Under XLA the cross-term matmul and the argmin are
separate fusions, so the full (chunk, n2) distance matrix round-trips
through HBM between them. This kernel computes the distance matrix
TILE-BY-TILE on the MXU and folds the (min, argmin) accumulation into
the same VMEM-resident loop — the matrix never leaves the chip.

Measured on TPU v5e (scripts/bench_nn.py, chained-scan timing): 1.46x
over the XLA path at B=128/n=1024, 1.28x at n=2048, 1.04x at n=4096 —
enabled as the default correspondence path on the TPU backend.

Layout notes (see /opt/skills/guides/pallas_guide.md):
- clouds are passed TRANSPOSED as (3, n) so the 128-lane axis is the
  point axis; the 3-row sublane axis pads to 8 internally;
- the cross term is one lax.dot_general contracting the coordinate
  axis: (3, TM) x (3, TN) -> (TM, TN) f32 on the MXU;
- invalid destination points carry +inf in their |b|^2 row, so they
  can never win the min;
- outputs are (TM//128, 128) tiles — the minimal layout satisfying
  the (8, 128) VMEM tiling rule for a 1-D result; with a single grid
  step the block simply equals the array, lifting the divisibility
  requirement for small clouds;
- ties resolve to the lower index (matching jnp.argmin) by
  strict-less updates over an ascending column sweep.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _nn_kernel(src_ref, dst_ref, dst_sq_ref, out_d2_ref, out_idx_ref,
               *, tm: int, tn: int):
    """One grid step handles a (tm,) strip of source points against the
    whole destination cloud, tn columns at a time."""
    n2 = dst_ref.shape[1]
    src = src_ref[:]                       # (3, tm)
    src_sq = jnp.sum(src * src, axis=0)    # (tm,)

    def body(j, carry):
        best_d2, best_idx = carry
        dst = dst_ref[:, pl.ds(j * tn, tn)]          # (3, tn)
        dst_sq = dst_sq_ref[0, pl.ds(j * tn, tn)]    # (tn,) +inf where pad
        cross = jax.lax.dot_general(
            src, dst, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                            # (tm, tn)
        d2 = src_sq[:, None] - 2.0 * cross + dst_sq[None, :]
        tile_d2 = jnp.min(d2, axis=1)
        tile_idx = jnp.argmin(d2, axis=1).astype(jnp.int32) + j * tn
        upd = tile_d2 < best_d2
        return (
            jnp.where(upd, tile_d2, best_d2),
            jnp.where(upd, tile_idx, best_idx),
        )

    init = (jnp.full((tm,), jnp.inf, jnp.float32),
            jnp.zeros((tm,), jnp.int32))
    best_d2, best_idx = jax.lax.fori_loop(0, n2 // tn, body, init)
    out_d2_ref[:, :] = jnp.maximum(best_d2, 0.0).reshape(tm // 128, 128)
    out_idx_ref[:, :] = best_idx.reshape(tm // 128, 128)


@jax.jit
def nn_argmin_pallas(src, dst, dst_mask):
    """For each src point: (index, squared distance) of the nearest valid
    dst point. Drop-in for the XLA path in icp/p2point.py.

    Args: src (n1, 3); dst (n2, 3); dst_mask (n2,) bool.
    Returns: idx (n1,) int32, d2 (n1,) float32.
    """
    n1 = src.shape[0]
    n2 = dst.shape[0]
    # source tiling: one strip if the cloud fits a single tile, else
    # 1024-point strips (bench sweet spot)
    n1p = _round_up(n1, 128)
    tm = n1p if n1p <= 1024 else 1024
    n1p = _round_up(n1, tm)
    # destination tiling: 512-column sweeps (or one sweep if smaller)
    n2p = _round_up(n2, 128)
    tn = n2p if n2p <= 512 else 512
    n2p = _round_up(n2, tn)

    src_t = jnp.pad(src.T.astype(jnp.float32), ((0, 0), (0, n1p - n1)))
    dst_t = jnp.pad(dst.T.astype(jnp.float32), ((0, 0), (0, n2p - n2)))
    dst_sq = jnp.sum(dst_t * dst_t, axis=0)
    dst_sq = jnp.where(
        jnp.pad(dst_mask, (0, n2p - n2), constant_values=False),
        dst_sq, jnp.inf,
    )[None, :]                                        # (1, n2p)

    d2, idx = pl.pallas_call(
        partial(_nn_kernel, tm=tm, tn=tn),
        grid=(n1p // tm,),
        interpret=jax.default_backend() == "cpu",
        in_specs=[
            pl.BlockSpec((3, tm), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, n2p), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n2p), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tm // 128, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm // 128, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n1p // 128, 128), jnp.float32),
            jax.ShapeDtypeStruct((n1p // 128, 128), jnp.int32),
        ],
    )(src_t, dst_t, dst_sq)
    return idx.reshape(-1)[:n1], d2.reshape(-1)[:n1]
