"""Pallas TPU kernels: fused DGCNN edge stage for TRAINING (fwd + bwd).

The serving-side fused edge kernel (edge_conv_kernels.py) folds eval-mode
BN and wins 1.7x on-chip, but training could not use it: train-mode BN
normalizes with CURRENT batch statistics (batchnorm.py, reference
tf_util.py:455-492) and autodiff needs the (B, N, k, C) intermediates.
The round-4 probe (docs/RESULTS.md) measured the DGCNN training premium
stuck at 4.1x after all graph-build fixes — what remains is the edge
stage's training graph: materialized (B, N, k, C1/C2) activations and,
in backward, XLA's scatter-add for the neighbor-gather gradient.

This module fuses the whole two-layer edge stage

    pre1_ij = U_i + V_j                  (first conv via the linear split,
                                          backbones.py round-4 rewrite)
    h1      = relu(g1*xhat1 + be1),  xhat1 = (pre1 - mu1) * rsqrt(var1+eps)
    pre2    = h1 @ W2 + b2
    h2      = relu(g2*xhat2 + be2)
    out_i   = max_j h2_ij

into six VMEM-resident passes that never write a (B, N, k, *) tensor to
HBM. (mu, var) are exact batch statistics over (B, N, k): each BN is
split into a reduction pass (channel sums of the pre-activation) and an
apply pass; the backward applies the standard batch-norm gradient

    dpre = g*r * (dy - mean(dy) - xhat * mean(dy * xhat))

(biased variance, matching batchnorm.py/autodiff) with the global means
produced by dedicated reduction passes. Neighbor access is a ONE-HOT
MXU MATMUL in both directions: gather (fwd) as ``onehot @ V`` and
scatter (bwd) as ``onehot^T @ dpre1`` — the backward direction replaces
XLA's serialized scatter-add for dV, the suspected residual cost.

Max-over-k gradients route the full cotangent to the FIRST argmax slot,
keyed on a slot-index map the forward pass emits (round-5 fix #1: the
round-4 backward recomputed h2 and relied on bitwise ``h2 == out``
equality against the forward kernel's output, which does not survive
Mosaic codegen differences between the unrolled forward and fori_loop
backward — on-chip grad_rel_err 1.41 while interpret mode passed;
round-5 fix #2: the backward's dynamic slot-row extraction must stay in
INTEGER arithmetic, because MXU matmuls round f32 inputs to bf16 and
corrupt indices above 256 — see ``_slot_idx``).
``jnp.max`` splits ties evenly instead, but exact positive ties between
DISTINCT neighbors are measure-zero in f32, and duplicate-index ties
scatter to identical U/V rows so the accumulated gradients coincide.
Relu gradients match ``jax.nn.relu`` (0 subgradient at 0).

Returned batch stats feed the caller's EMA update and are
NON-DIFFERENTIABLE auxiliary outputs (stop_gradient semantics — the EMA
update is mutable state, not a loss term, as in batchnorm.py).

STATUS: flag-gated OFF by default (``model.options.dgcnn_fused_train``).
Per the round-3 verdict rule it cannot become a TPU default until an
on-chip exactness + timing record lands in docs/onchip_smoke.json
(scripts/onchip_smoke.py has a check wired). All kernel math is f32
regardless of model dtype — strictly more precise than the bf16 XLA
graph it replaces.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SEQ = pltpu.CompilerParams(
    dimension_semantics=("arbitrary", "arbitrary"),
    vmem_limit_bytes=64 * 1024 * 1024,
)

# Backward passes carry ~3x the live temporaries of forward (slot chain
# recompute + gradient strips), so they tile at most 128 rows
# regardless of the forward tile (128 also won the on-chip kNN tile sweep).
# They also run their k-loops as lax.fori_loop, NOT Python unrolls: the
# unrolled backward blew Mosaic's 16MB scoped-VMEM *stack* allocator on-chip
# (17.6-18.1MB, queue.log round-4 warm session) — that stack limit is an XLA
# flag (--xla_tpu_scoped_vmem_limit_kib), untouched by the Pallas
# vmem_limit_bytes param above, so the durable fix is bounding live
# temporaries to one slot's frame. Forward stays unrolled (it fits and
# pipelines better: 19.5 vs 43.5 ms/step on-chip at B=256/N=512).
_BWD_TM = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _row_mask(strip, tm: int, n: int):
    """(tm, 1) f32 mask of rows that are real points (not N-padding)."""
    rows = strip * tm + jax.lax.broadcasted_iota(jnp.int32, (tm, 1), 0)
    return (rows < n).astype(jnp.float32)


def _gather_v(v, idx_t, tm: int, prec=None):
    """One neighbor slot's rows of v via a one-hot MXU matmul.

    Returns (onehot, rows) — backward reuses onehot transposed.
    At default MXU precision the matmul rounds v through bf16 passes
    (~2^-8 relative); ``prec='highest'`` makes the gather exact f32 —
    used by the on-chip logic-exactness smoke row, too slow to ship.
    """
    col = jax.lax.broadcasted_iota(jnp.int32, (tm, v.shape[0]), 1)
    onehot = (col == idx_t[:, None]).astype(v.dtype)
    rows = jax.lax.dot_general(
        onehot, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    return onehot, rows


def _slot_chain(u, v, idx_t, tm, bn1, w2, b2, bn2, prec=None):
    """Recompute one neighbor slot's forward chain for a (tm,)-strip.

    ``idx_t`` is the slot's (tm,) neighbor indices (callers slice it out
    of the idx block — statically in the unrolled forward, dynamically in
    the fori_loop backward). Every pass derives from this single helper;
    max routing is keyed on the forward-emitted slot map, NOT on bitwise
    recompute equality (see module doc — the round-4 on-chip failure).
    Returns dict of the intermediates each pass needs.
    """
    mu1, r1, g1, be1 = bn1
    onehot, rows = _gather_v(v, idx_t, tm, prec)
    pre1 = u + rows
    xhat1 = (pre1 - mu1) * r1
    y1 = xhat1 * g1 + be1
    h1 = jnp.maximum(y1, 0.0)
    out = {"onehot": onehot, "pre1": pre1, "xhat1": xhat1, "y1": y1,
           "h1": h1}
    if w2 is not None:
        mu2, r2, g2, be2 = bn2
        pre2 = jax.lax.dot_general(
            h1, w2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ) + b2
        xhat2 = (pre2 - mu2) * r2
        y2 = xhat2 * g2 + be2
        h2 = jnp.maximum(y2, 0.0)
        out.update({"pre2": pre2, "xhat2": xhat2, "y2": y2, "h2": h2})
    return out


# ---------------------------------------------------------------------------
# forward passes
# ---------------------------------------------------------------------------


def _stats1_kernel(u_ref, v_ref, idx_ref, s_ref, ss_ref, *, k, tm, n,
                   prec=None):
    """Pass A: channel sums of pre1 = U_i + V_j over real (i, t) pairs."""
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        s_ref[...] = jnp.zeros_like(s_ref)
        ss_ref[...] = jnp.zeros_like(ss_ref)

    u, v = u_ref[0], v_ref[0]
    mask = _row_mask(pl.program_id(1), tm, n)
    s = jnp.zeros_like(s_ref)
    ss = jnp.zeros_like(ss_ref)
    for t in range(k):
        _, rows = _gather_v(v, idx_ref[0, t, :], tm, prec)
        pre1 = (u + rows) * mask
        s = s + jnp.sum(pre1, axis=0, keepdims=True)
        ss = ss + jnp.sum(pre1 * pre1, axis=0, keepdims=True)
    s_ref[...] += s
    ss_ref[...] += ss


def _stats2_kernel(u_ref, v_ref, idx_ref, bn1_ref, w2_ref, b2_ref,
                   s_ref, ss_ref, *, k, tm, n, prec=None):
    """Pass B: channel sums of pre2 = h1 @ W2 + b2."""
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        s_ref[...] = jnp.zeros_like(s_ref)
        ss_ref[...] = jnp.zeros_like(ss_ref)

    u, v = u_ref[0], v_ref[0]
    bn1 = tuple(bn1_ref[i] for i in range(4))
    w2, b2 = w2_ref[...], b2_ref[...]
    mask = _row_mask(pl.program_id(1), tm, n)
    s = jnp.zeros_like(s_ref)
    ss = jnp.zeros_like(ss_ref)
    for t in range(k):
        c = _slot_chain(u, v, idx_ref[0, t, :], tm, bn1, None, None, None,
                        prec)
        pre2 = (jax.lax.dot_general(
            c["h1"], w2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ) + b2) * mask
        s = s + jnp.sum(pre2, axis=0, keepdims=True)
        ss = ss + jnp.sum(pre2 * pre2, axis=0, keepdims=True)
    s_ref[...] += s
    ss_ref[...] += ss


def _apply_kernel(u_ref, v_ref, idx_ref, bn1_ref, w2_ref, b2_ref, bn2_ref,
                  out_ref, slot_ref, *, k, tm, prec=None):
    """Pass C: out_i = max_t h2, plus the f32 argmax slot index per
    (row, channel) — the backward passes key max-routing on this map
    instead of recomputing h2 and comparing bitwise (see module doc)."""
    u, v = u_ref[0], v_ref[0]
    bn1 = tuple(bn1_ref[i] for i in range(4))
    bn2 = tuple(bn2_ref[i] for i in range(4))
    w2, b2 = w2_ref[...], b2_ref[...]
    acc = None
    slot = None
    for t in range(k):
        c = _slot_chain(u, v, idx_ref[0, t, :], tm, bn1, w2, b2, bn2, prec)
        if acc is None:
            acc = c["h2"]
            slot = jnp.zeros_like(acc)
        else:
            better = c["h2"] > acc
            acc = jnp.where(better, c["h2"], acc)
            slot = jnp.where(better, jnp.float32(t), slot)
    out_ref[0] = acc
    slot_ref[0] = slot


# ---------------------------------------------------------------------------
# backward passes
# ---------------------------------------------------------------------------


def _slot_idx(idx_all, t, tm: int):
    """Dynamic (tm,) slot-t row of the (k, tm) idx block value.

    Mosaic TC does not lower ``dynamic_slice`` on values (on-chip smoke
    record, round 4), and the round-5 first cut — a one-hot
    (1, k) @ (k, tm) f32 matmul — was WRONG ON SILICON for N > 256:
    MXU matmuls round f32 inputs to bf16 unless precision is raised
    (8 mantissa bits — integers above 256 are unrepresentable), so
    neighbor indices 257+ came back off-by-one and the backward gathered
    the wrong point rows (on-chip grad_rel_err 1.48 at N=512 while
    interpret passed; the nn_argmin bf16-pass failure class again).
    The row is instead selected with an INTEGER masked reduction on the
    VPU — no matmul, no rounding, exact for all int32 indices.
    """
    k = idx_all.shape[0]
    sel = jax.lax.broadcasted_iota(jnp.int32, (k, tm), 0) == t
    return jnp.sum(jnp.where(sel, idx_all, 0), axis=0)


def _bwd2_kernel(u_ref, v_ref, idx_ref, bn1_ref, w2_ref, b2_ref, bn2_ref,
                 slot_ref, dout_ref, sa_ref, sb_ref, *, k, tm, n,
                 prec=None):
    """Pass D: BN2-backward global sums sa2 = sum(dy2), sb2 = sum(dy2*xhat2)."""
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        sa_ref[...] = jnp.zeros_like(sa_ref)
        sb_ref[...] = jnp.zeros_like(sb_ref)

    u, v = u_ref[0], v_ref[0]
    bn1 = tuple(bn1_ref[i] for i in range(4))
    bn2 = tuple(bn2_ref[i] for i in range(4))
    w2, b2 = w2_ref[...], b2_ref[...]
    slot, dout = slot_ref[0], dout_ref[0]
    idx_all = idx_ref[0]
    mask = _row_mask(pl.program_id(1), tm, n)
    scale = dout * mask

    def body(t, carry):
        sa, sb = carry
        c = _slot_chain(u, v, _slot_idx(idx_all, t, tm), tm, bn1, w2, b2,
                        bn2, prec)
        dh2 = (slot == t.astype(jnp.float32)).astype(jnp.float32) * scale
        dy2 = dh2 * (c["y2"] > 0.0)
        return (sa + jnp.sum(dy2, axis=0, keepdims=True),
                sb + jnp.sum(dy2 * c["xhat2"], axis=0, keepdims=True))

    sa, sb = jax.lax.fori_loop(
        0, k, body, (jnp.zeros_like(sa_ref), jnp.zeros_like(sb_ref)))
    sa_ref[...] += sa
    sb_ref[...] += sb


def _bwd_mid_kernel(u_ref, v_ref, idx_ref, bn1_ref, w2_ref, b2_ref, bn2_ref,
                    slot_ref, dout_ref, m2_ref, dw2_ref, db2_ref,
                    sa_ref, sb_ref, *, k, tm, n, prec=None):
    """Pass E: BN2-corrected dpre2 -> dW2, db2, and BN1-backward sums.

    m2_ref rows: (mean(dy2), mean(dy2*xhat2)) per C2 channel.
    Outputs: dw2 (C1, C2), db2 (1, C2), sa1 = sum(dy1), sb1 =
    sum(dy1*xhat1) (1, C1).
    """
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)
        sa_ref[...] = jnp.zeros_like(sa_ref)
        sb_ref[...] = jnp.zeros_like(sb_ref)

    u, v = u_ref[0], v_ref[0]
    bn1 = tuple(bn1_ref[i] for i in range(4))
    bn2 = tuple(bn2_ref[i] for i in range(4))
    _, r2, g2, _ = bn2
    w2, b2 = w2_ref[...], b2_ref[...]
    slot, dout = slot_ref[0], dout_ref[0]
    idx_all = idx_ref[0]
    ma2, mb2 = m2_ref[0], m2_ref[1]
    mask = _row_mask(pl.program_id(1), tm, n)
    scale = dout * mask
    a2 = g2 * r2

    def body(t, carry):
        dw2, db2, sa, sb = carry
        c = _slot_chain(u, v, _slot_idx(idx_all, t, tm), tm, bn1, w2, b2,
                        bn2, prec)
        dh2 = (slot == t.astype(jnp.float32)).astype(jnp.float32) * scale
        dy2 = dh2 * (c["y2"] > 0.0)
        dpre2 = a2 * (dy2 - ma2 - c["xhat2"] * mb2) * mask
        dw2 = dw2 + jax.lax.dot_general(
            c["h1"], dpre2, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        db2 = db2 + jnp.sum(dpre2, axis=0, keepdims=True)
        dh1 = jax.lax.dot_general(
            dpre2, w2, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        dy1 = dh1 * (c["y1"] > 0.0)
        sa = sa + jnp.sum(dy1, axis=0, keepdims=True)
        sb = sb + jnp.sum(dy1 * c["xhat1"], axis=0, keepdims=True)
        return dw2, db2, sa, sb

    dw2, db2, sa, sb = jax.lax.fori_loop(
        0, k, body,
        (jnp.zeros_like(dw2_ref), jnp.zeros_like(db2_ref),
         jnp.zeros_like(sa_ref), jnp.zeros_like(sb_ref)))
    dw2_ref[...] += dw2
    db2_ref[...] += db2
    sa_ref[...] += sa
    sb_ref[...] += sb


def _bwd_in_kernel(u_ref, v_ref, idx_ref, bn1_ref, w2_ref, b2_ref, bn2_ref,
                   slot_ref, dout_ref, m2_ref, m1_ref, du_ref, dv_ref,
                   *, k, tm, n, prec=None):
    """Pass F: BN1-corrected dpre1 -> dU (strip) and dV (scatter via
    onehot^T matmul, accumulated per batch element)."""
    strip_first = pl.program_id(1) == 0

    @pl.when(strip_first)
    def _():
        dv_ref[...] = jnp.zeros_like(dv_ref)

    u, v = u_ref[0], v_ref[0]
    bn1 = tuple(bn1_ref[i] for i in range(4))
    bn2 = tuple(bn2_ref[i] for i in range(4))
    _, r1, g1, _ = bn1
    _, r2, g2, _ = bn2
    w2, b2 = w2_ref[...], b2_ref[...]
    slot, dout = slot_ref[0], dout_ref[0]
    idx_all = idx_ref[0]
    ma2, mb2 = m2_ref[0], m2_ref[1]
    ma1, mb1 = m1_ref[0], m1_ref[1]
    mask = _row_mask(pl.program_id(1), tm, n)
    scale = dout * mask
    a1 = g1 * r1
    a2 = g2 * r2

    def body(t, carry):
        du, dv = carry
        c = _slot_chain(u, v, _slot_idx(idx_all, t, tm), tm, bn1, w2, b2,
                        bn2, prec)
        dh2 = (slot == t.astype(jnp.float32)).astype(jnp.float32) * scale
        dy2 = dh2 * (c["y2"] > 0.0)
        dpre2 = a2 * (dy2 - ma2 - c["xhat2"] * mb2) * mask
        dh1 = jax.lax.dot_general(
            dpre2, w2, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        dy1 = dh1 * (c["y1"] > 0.0)
        dpre1 = a1 * (dy1 - ma1 - c["xhat1"] * mb1) * mask
        du = du + dpre1
        dv = dv + jax.lax.dot_general(
            c["onehot"], dpre1, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        return du, dv

    du, dv = jax.lax.fori_loop(
        0, k, body,
        (jnp.zeros(du_ref.shape[1:], jnp.float32),
         jnp.zeros(dv_ref.shape[1:], jnp.float32)))
    du_ref[0] = du
    dv_ref[0] += dv


# ---------------------------------------------------------------------------
# host-side orchestration
# ---------------------------------------------------------------------------


def _channel_rows(*vecs):
    """Stack per-channel vectors as the rows of one (len, C) f32 array."""
    return jnp.stack([v.astype(jnp.float32).reshape(-1) for v in vecs])


def _pallas(kernel, grid, in_specs, out_specs, out_shape, interpret, **kw):
    return pl.pallas_call(
        partial(kernel, **kw), grid=grid, in_specs=in_specs,
        out_specs=out_specs, out_shape=out_shape, interpret=interpret,
        compiler_params=_SEQ,
    )


@partial(jax.jit,
         static_argnames=("eps", "tm", "interpret", "precision"))
def fused_edge_stage_train(f, idx, w1, b1, g1, be1, w2, b2, g2, be2,
                           *, eps: float = 1e-3, tm: int = 256,
                           interpret: bool | None = None,
                           precision: str | None = None):
    """Fused training edge stage.

    f: (B, N, C) input features; idx: (B, N, k) int32 neighbor indices
    (non-differentiable); w1: (2C, C1) first conv kernel (reference
    edge-feature convention [x_i, x_j - x_i]); b1: (C1,); g1/be1: BN1
    scale/bias; w2: (C1, C2); b2: (C2,); g2/be2: BN2 scale/bias.

    ``precision`` threads into every MXU matmul (kernel-internal AND
    host-side chain): None = MXU default (bf16 passes, production),
    'highest' = exact f32 — used by the on-chip smoke logic-exactness
    row, where both this kernel and the stable_max XLA reference run
    at HIGHEST so near-tie argmax routing flips cannot masquerade as
    (or hide) logic bugs.

    Returns (out, (mu1, var1, mu2, var2)): out (B, N, C2) f32, stats f32
    per channel — exactly the quantities the naive XLA graph produces.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    out, stats = _fused_vjp(f, idx, w1, b1, g1, be1, w2, b2, g2, be2,
                            eps, tm, interpret, precision)
    return out, stats


@partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13))
def _fused_vjp(f, idx, w1, b1, g1, be1, w2, b2, g2, be2,
               eps, tm, interpret, precision):
    out, stats, _ = _fused_fwd_impl(f, idx, w1, b1, g1, be1, w2, b2, g2,
                                    be2, eps, tm, interpret, precision)
    return out, stats


def _prep(f, idx, w1, b1, tm, prec=None):
    b, n, c = f.shape
    k = idx.shape[-1]
    tm = min(tm, _round_up(n, 128))
    np_ = _round_up(n, tm)
    ff = f.astype(jnp.float32)
    a_w = (w1[:c] - w1[c:]).astype(jnp.float32)
    q_w = w1[c:].astype(jnp.float32)
    u = jnp.matmul(ff, a_w, precision=prec) + b1.astype(jnp.float32)
    v = jnp.matmul(ff, q_w, precision=prec)
    u = jnp.pad(u, ((0, 0), (0, np_ - n), (0, 0)))
    v = jnp.pad(v, ((0, 0), (0, np_ - n), (0, 0)))
    idxT = jnp.transpose(idx.astype(jnp.int32), (0, 2, 1))
    idxT = jnp.pad(idxT, ((0, 0), (0, 0), (0, np_ - n)))
    return ff, a_w, q_w, u, v, idxT, b, n, c, k, tm, np_


def _common_specs(np_, c1, tm, k):
    u_spec = pl.BlockSpec((1, tm, c1), lambda bi, i: (bi, i, 0),
                          memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((1, np_, c1), lambda bi, i: (bi, 0, 0),
                          memory_space=pltpu.VMEM)
    i_spec = pl.BlockSpec((1, k, tm), lambda bi, i: (bi, 0, i),
                          memory_space=pltpu.VMEM)
    return u_spec, v_spec, i_spec


def _table_spec(rows, cols):
    return pl.BlockSpec((rows, cols), lambda bi, i: (0, 0),
                        memory_space=pltpu.VMEM)


def _acc_shape(rows, cols):
    return jax.ShapeDtypeStruct((rows, cols), jnp.float32)


def _fused_fwd_impl(f, idx, w1, b1, g1, be1, w2, b2, g2, be2,
                    eps, tm, interpret, prec=None):
    ff, a_w, q_w, u, v, idxT, b, n, c, k, tm, np_ = _prep(f, idx, w1, b1,
                                                          tm, prec)
    c1 = w1.shape[1]
    c2 = w2.shape[1]
    m_count = b * n * k
    grid = (b, np_ // tm)
    u_spec, v_spec, i_spec = _common_specs(np_, c1, tm, k)
    w2f = w2.astype(jnp.float32)
    b2f = b2.astype(jnp.float32).reshape(1, -1)

    s1, ss1 = _pallas(
        _stats1_kernel, grid, [u_spec, v_spec, i_spec],
        [_table_spec(1, c1), _table_spec(1, c1)],
        [_acc_shape(1, c1), _acc_shape(1, c1)],
        interpret, k=k, tm=tm, n=n, prec=prec,
    )(u, v, idxT)
    mu1 = (s1 / m_count).reshape(-1)
    var1 = (ss1 / m_count).reshape(-1) - mu1 * mu1
    r1 = jax.lax.rsqrt(var1 + eps)
    bn1 = _channel_rows(mu1, r1, g1, be1)

    s2, ss2 = _pallas(
        _stats2_kernel, grid,
        [u_spec, v_spec, i_spec, _table_spec(4, c1),
         _table_spec(c1, c2), _table_spec(1, c2)],
        [_table_spec(1, c2), _table_spec(1, c2)],
        [_acc_shape(1, c2), _acc_shape(1, c2)],
        interpret, k=k, tm=tm, n=n, prec=prec,
    )(u, v, idxT, bn1, w2f, b2f)
    mu2 = (s2 / m_count).reshape(-1)
    var2 = (ss2 / m_count).reshape(-1) - mu2 * mu2
    r2 = jax.lax.rsqrt(var2 + eps)
    bn2 = _channel_rows(mu2, r2, g2, be2)

    oc_spec = pl.BlockSpec((1, tm, c2), lambda bi, i: (bi, i, 0),
                           memory_space=pltpu.VMEM)
    out_pad, slot_pad = _pallas(
        _apply_kernel, grid,
        [u_spec, v_spec, i_spec, _table_spec(4, c1),
         _table_spec(c1, c2), _table_spec(1, c2), _table_spec(4, c2)],
        [oc_spec, oc_spec],
        [jax.ShapeDtypeStruct((b, np_, c2), jnp.float32),
         jax.ShapeDtypeStruct((b, np_, c2), jnp.float32)],
        interpret, k=k, tm=tm, prec=prec,
    )(u, v, idxT, bn1, w2f, b2f, bn2)

    out = out_pad[:, :n, :]
    stats = (mu1, var1, mu2, var2)
    # residuals must be a pytree of ARRAYS (static ints are re-derived
    # from shapes in the bwd rule; dtypes ride as zero-size tokens)
    resid = (ff, a_w, q_w, u, v, idxT, bn1, bn2, w2f, b2f, slot_pad,
             jnp.zeros((0,), f.dtype), jnp.zeros((0,), w1.dtype))
    return out, stats, resid


def _fused_fwd_rule(f, idx, w1, b1, g1, be1, w2, b2, g2, be2,
                    eps, tm, interpret, precision):
    out, stats, resid = _fused_fwd_impl(f, idx, w1, b1, g1, be1, w2, b2,
                                        g2, be2, eps, tm, interpret,
                                        precision)
    return (out, stats), resid


def _fused_bwd_rule(eps, tm_arg, interpret, prec, saved, cotangents):
    (ff, a_w, q_w, u, v, idxT, bn1, bn2, w2f, b2f, slot_pad,
     f_tok, w_tok) = saved
    f_dtype, w_dtype = f_tok.dtype, w_tok.dtype
    dout, _dstats = cotangents  # stats are non-differentiable aux outputs
    b, n, c = ff.shape
    k = idxT.shape[1]
    np_ = u.shape[1]
    tm = min(tm_arg, _BWD_TM, _round_up(n, 128))
    m_count = b * n * k
    c1 = a_w.shape[1]
    c2 = w2f.shape[1]
    grid = (b, np_ // tm)
    u_spec, v_spec, i_spec = _common_specs(np_, c1, tm, k)
    o_spec = pl.BlockSpec((1, tm, c2), lambda bi, i: (bi, i, 0),
                          memory_space=pltpu.VMEM)
    dout_pad = jnp.pad(dout.astype(jnp.float32),
                       ((0, 0), (0, np_ - n), (0, 0)))

    sa2, sb2 = _pallas(
        _bwd2_kernel, grid,
        [u_spec, v_spec, i_spec, _table_spec(4, c1),
         _table_spec(c1, c2), _table_spec(1, c2), _table_spec(4, c2),
         o_spec, o_spec],
        [_table_spec(1, c2), _table_spec(1, c2)],
        [_acc_shape(1, c2), _acc_shape(1, c2)],
        interpret, k=k, tm=tm, n=n, prec=prec,
    )(u, v, idxT, bn1, w2f, b2f, bn2, slot_pad, dout_pad)
    m2 = jnp.concatenate([sa2, sb2], axis=0) / m_count  # (2, C2)

    dw2, db2, sa1, sb1 = _pallas(
        _bwd_mid_kernel, grid,
        [u_spec, v_spec, i_spec, _table_spec(4, c1),
         _table_spec(c1, c2), _table_spec(1, c2), _table_spec(4, c2),
         o_spec, o_spec, _table_spec(2, c2)],
        [_table_spec(c1, c2), _table_spec(1, c2),
         _table_spec(1, c1), _table_spec(1, c1)],
        [_acc_shape(c1, c2), _acc_shape(1, c2),
         _acc_shape(1, c1), _acc_shape(1, c1)],
        interpret, k=k, tm=tm, n=n, prec=prec,
    )(u, v, idxT, bn1, w2f, b2f, bn2, slot_pad, dout_pad, m2)
    m1 = jnp.concatenate([sa1, sb1], axis=0) / m_count  # (2, C1)

    du_pad, dv_pad = _pallas(
        _bwd_in_kernel, grid,
        [u_spec, v_spec, i_spec, _table_spec(4, c1),
         _table_spec(c1, c2), _table_spec(1, c2), _table_spec(4, c2),
         o_spec, o_spec, _table_spec(2, c2), _table_spec(2, c1)],
        [pl.BlockSpec((1, tm, c1), lambda bi, i: (bi, i, 0),
                      memory_space=pltpu.VMEM),
         pl.BlockSpec((1, np_, c1), lambda bi, i: (bi, 0, 0),
                      memory_space=pltpu.VMEM)],
        [jax.ShapeDtypeStruct((b, np_, c1), jnp.float32),
         jax.ShapeDtypeStruct((b, np_, c1), jnp.float32)],
        interpret, k=k, tm=tm, n=n, prec=prec,
    )(u, v, idxT, bn1, w2f, b2f, bn2, slot_pad, dout_pad, m2, m1)
    du = du_pad[:, :n, :]
    dv = dv_pad[:, :n, :]

    # chain through U = f @ (P - Q) + b1, V = f @ Q
    df = (jnp.matmul(du, a_w.T, precision=prec) +
          jnp.matmul(dv, q_w.T, precision=prec)).astype(f_dtype)
    da = jnp.einsum("bnc,bnd->cd", ff, du, precision=prec)
    dq_ = jnp.einsum("bnc,bnd->cd", ff, dv, precision=prec)
    dw1 = jnp.concatenate([da, dq_ - da], axis=0).astype(w_dtype)
    db1 = jnp.sum(du, axis=(0, 1))
    dg2 = sb2.reshape(-1)
    dbe2 = sa2.reshape(-1)
    dg1 = sb1.reshape(-1)
    dbe1 = sa1.reshape(-1)
    didx = np.zeros((b, n, k), jax.dtypes.float0)
    return (df, didx, dw1, db1, dg1, dbe1,
            dw2.astype(w_dtype), db2.reshape(-1), dg2, dbe2)


_fused_vjp.defvjp(_fused_fwd_rule, _fused_bwd_rule)
