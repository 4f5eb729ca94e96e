"""Pallas TPU kernel: fused DGCNN edge-conv stage (gather-free).

The DGCNN edge stage (reference utils/tf_util_dgcnn.py:674-706 +
models/tp8.py:30-46) materializes edge features ``[x_i, x_j - x_i]`` of
shape (B, N, k, 2C), runs two 1x1 convs, and max-reduces over the k
neighbors. Round-3 decomposition (docs/DESIGN.md §4b-ii) measured the
neighbor GATHER as the dominant term after top-k — ~7 ms at
B=128/N=512/k=20 even with the flat-row fix, because it round-trips the
(B, N, k, C) tensor through HBM twice (gather out, conv in).

This kernel removes the gather and the edge tensor entirely:

  conv1(edge_ij) = W1 @ [x_i; x_j - x_i] = (P - Q) @ x_i + Q @ x_j
                 =: U_i + V_j

U and V are two tiny XLA matmuls on (B, N, C). The kernel walks the k
neighbor slots per (TM,)-strip of points: each slot's gather is a
ONE-HOT MATMUL — (TM, N) selector @ V (N, C1) on the MXU (a row gather
the MXU does for free; per-element gathers are the thing the TPU can't
do) — followed by the two folded affine+ReLU stages and a running max.
Only the (B, N, C2) result is ever written to HBM.

Weights are FOLDED (BN eval affine absorbed): this is an inference/eval
path, like the pointnet folded chain in serving.py. Training keeps the
XLA graph (BN batch stats + autodiff).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _edge_kernel(u_ref, v_ref, idx_ref, w2_ref, b2_ref, out_ref,
                 *, k: int, tm: int):
    """One grid step: fused edge stage for a (tm,) strip of points.

    u_ref: (1, tm, C1) = U_i + b1 for the strip (bias folded in)
    v_ref: (1, n, C1)  = V for the whole cloud
    idx_ref: (1, k, tm) neighbor indices (k on sublanes, points on lanes)
    w2_ref: (C1, C2); b2_ref: (1, C2)
    out_ref: (1, tm, C2)
    """
    n = v_ref.shape[1]
    u = u_ref[0]                                   # (tm, C1)
    v = v_ref[0]                                   # (n, C1)
    w2 = w2_ref[...]
    b2 = b2_ref[...]                               # (1, C2)
    col = jax.lax.broadcasted_iota(jnp.int32, (tm, n), 1)

    acc = None
    for t in range(k):
        idx_t = idx_ref[0, t, :]                   # (tm,)
        onehot = (col == idx_t[:, None]).astype(v.dtype)   # (tm, n)
        vj = jax.lax.dot_general(
            onehot, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                          # (tm, C1)
        h1 = jnp.maximum(u + vj, 0.0)
        h2 = jax.lax.dot_general(
            h1.astype(w2.dtype), w2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b2
        h2 = jnp.maximum(h2, 0.0)                  # (tm, C2)
        acc = h2 if acc is None else jnp.maximum(acc, h2)
    out_ref[0] = acc.astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("tm", "interpret"))
def fused_edge_stage(points: jax.Array, nn_idx: jax.Array,
                     w1: jax.Array, b1: jax.Array,
                     w2: jax.Array, b2: jax.Array,
                     tm: int = 256, interpret: bool | None = None
                     ) -> jax.Array:
    """Fused folded edge-conv stage: (B, N, C) x (B, N, k) -> (B, N, C2).

    Equivalent (tested) to:
        e = get_edge_feature(points, nn_idx)          # (B, N, k, 2C)
        h = relu(e @ w1 + b1); h = relu(h @ w2 + b2)
        return h.max(axis=2)
    with w1 of shape (2C, C1) and folded biases (eval-mode BN affine
    absorbed by the caller, e.g. serving._fold_dense_bn).
    """
    b, n, c = points.shape
    _, _, k = nn_idx.shape
    c1 = w1.shape[1]
    c2 = w2.shape[1]
    assert w1.shape[0] == 2 * c, (w1.shape, c)
    assert tm % 128 == 0, f"tm must be a lane multiple (got {tm})"
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    np_ = _round_up(n, 128)
    tm = min(tm, np_)
    np_ = _round_up(n, tm)

    # conv1 split: W1 @ [x_i; x_j - x_i] = (P - Q) @ x_i + Q @ x_j
    p_w = w1[:c]                                  # self rows
    q_w = w1[c:]                                  # neighbor-delta rows
    x32 = points.astype(jnp.float32)
    u = x32 @ (p_w - q_w).astype(jnp.float32) + b1.astype(jnp.float32)
    v = x32 @ q_w.astype(jnp.float32)
    u = jnp.pad(u, ((0, 0), (0, np_ - n), (0, 0)))
    v = jnp.pad(v, ((0, 0), (0, np_ - n), (0, 0)))
    # idx transposed to (B, k, N): k on sublanes, points on lanes — same
    # layout trick as knn_points_pallas's output
    idxT = jnp.transpose(nn_idx.astype(jnp.int32), (0, 2, 1))
    idxT = jnp.pad(idxT, ((0, 0), (0, 0), (0, np_ - n)))

    out = pl.pallas_call(
        partial(_edge_kernel, k=k, tm=tm),
        grid=(b, np_ // tm),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((1, tm, c1), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_, c1), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, tm), lambda bi, i: (bi, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c1, c2), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c2), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tm, c2), lambda bi, i: (bi, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, np_, c2), jnp.float32),
    )(u, v, idxT, w2.astype(jnp.float32),
      b2.reshape(1, -1).astype(jnp.float32))
    return out[:, :n, :]
