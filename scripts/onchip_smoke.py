#!/usr/bin/env python
"""On-chip validation of every TPU-default / opt-in kernel path (<2 min).

Round-3 verdict: a Pallas kernel shipped as a TPU default with only
interpret-mode (CPU) tests. Process fix: THIS script runs on the live
backend at every round open and after any kernel edit, and its JSON
output is committed (docs/onchip_smoke.json). No code path may become a
TPU default without a passing entry here.

Checks (each exact- or tolerance-verified against the XLA reference on
the live backend, plus a chained-scan timing for the perf-motivated
ones):
  knn_pallas    exactness on 3 shapes (incl. non-tile-multiple N) +
                ms/call vs the XLA top_k path at the DGCNN train shape
  nn_argmin     exactness vs XLA argmin (ICP correspondence kernel)
  int8_quant    fused int8 pointnet chain vs f32 (rel tolerance); also
                records the symmetric-vs-unsigned activation error
  folded_serving build_inference_fn vs model.apply eval mode (f32)

Run ONLY through the serialized TPU queue (CLAUDE.md tunnel gotchas).
Usage: python scripts/onchip_smoke.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_ITERS = 20


def timed_ms(fn, feed, probe):
    """Best-of-3 chained-scan wall time per call (CLAUDE.md: dispatch RTT
    through the tunnel swamps single-call timing; scan serializes on
    device)."""
    import jax
    import jax.numpy as jnp  # noqa: F401

    @partial(jax.jit, static_argnums=(1,))
    def chained(p, iters):
        def body(carry, _):
            out = fn(carry)
            return carry + probe(out), 0.0

        final, _ = jax.lax.scan(body, p, None, length=iters)
        return final

    np.asarray(chained(feed, N_ITERS))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(chained(feed, N_ITERS))
        best = min(best, time.perf_counter() - t0)
    return best / N_ITERS * 1e3


def _check_edge_train_fused(record, timed_ms, rng, jnp, ptse, idxe,
                            w1, b1, w2, b2, be, ne, ke):
    """Check 6: fused TRAINING edge stage (fwd+bwd custom VJP) vs XLA.

    The gradient REFERENCE is the naive graph with ``stable_max`` routing,
    NOT plain ``jnp.max``: jit(grad(jnp.max-graph)) is itself wrong on
    jax 0.9.0 (XLA reduce_max VJP drops cotangents under remat —
    FD-proven, ops/stable_max.py + tests/test_stable_max.py), so the old
    check compared the kernel against a broken reference. The naive
    jnp.max variant is kept for TIMING (it is the production
    alternative) and its gradient deviation from the stable reference is
    recorded as ``xla_jit_max_vjp_err`` — the on-chip magnitude of the
    XLA bug itself.

    Gate metric is relative L2, not max-norm: on-chip the fused kernel's
    h2 differs from XLA's by ~1e-2 (bf16 MXU passes), so near-tie argmax
    flips between the two implementations are legitimate subgradient
    differences that move O(1) cotangents on isolated elements — huge in
    max-norm, negligible in L2. Systematic corruption (dropped mass,
    wrong index rows) dominates L2. Max-norm is recorded as diagnostic.

    Round-5 refinement: at DEFAULT MXU precision the two sides can
    never agree exactly — the fused gather rounds v through bf16
    passes, so ~0.3% of (row, channel) positions route their max to a
    different near-tied slot than XLA does (recorded as
    ``slot_flip_rate``), and each flip moves an O(1) cotangent. This
    row therefore gates on the bf16 ENVELOPE (forward < 2e-2, grad L2
    < 0.15 — a corruption ceiling that still catches the round-4/5
    index-bug class, which measured 1.41-1.48) plus timing; true LOGIC
    exactness is gated by ``_check_edge_train_fused_highest``, where
    both sides run f32-exact and routing flips vanish.
    """
    import jax

    from alignnet3d_tpu.ops.edge_train_kernels import fused_edge_stage_train
    from alignnet3d_tpu.ops.knn import get_edge_feature
    from alignnet3d_tpu.ops.stable_max import stable_max

    g1 = jnp.asarray(1.0 + 0.1 * rng.normal(size=(64,)), jnp.float32)
    be1 = jnp.asarray(0.1 * rng.normal(size=(64,)), jnp.float32)
    g2 = jnp.asarray(1.0 + 0.1 * rng.normal(size=(128,)), jnp.float32)
    be2 = jnp.asarray(0.1 * rng.normal(size=(128,)), jnp.float32)

    def xla_train_edge(p, pool=jnp.max):
        e = get_edge_feature(p, idxe)
        pre1 = e @ w1 + b1
        mu1 = jnp.mean(pre1, axis=(0, 1, 2))
        v1 = jnp.mean(jnp.square(pre1), axis=(0, 1, 2)) - jnp.square(mu1)
        h1 = jax.nn.relu((pre1 - mu1) * jax.lax.rsqrt(v1 + 1e-3) * g1 + be1)
        pre2 = h1 @ w2 + b2
        mu2 = jnp.mean(pre2, axis=(0, 1, 2))
        v2 = jnp.mean(jnp.square(pre2), axis=(0, 1, 2)) - jnp.square(mu2)
        h2 = jax.nn.relu((pre2 - mu2) * jax.lax.rsqrt(v2 + 1e-3) * g2 + be2)
        return pool(h2, axis=2)

    def fused_train_edge(p):
        return fused_edge_stage_train(p, idxe, w1, b1, g1, be1,
                                      w2, b2, g2, be2)[0]

    want_t = np.asarray(jax.jit(xla_train_edge)(ptse))
    got_t = np.asarray(jax.jit(fused_train_edge)(ptse))
    rel_t = float(np.max(np.abs(got_t - want_t)) / np.max(np.abs(want_t)))

    gw = np.asarray(jax.jit(jax.grad(
        lambda p: jnp.sum(jnp.sin(xla_train_edge(p, stable_max)))))(ptse))
    gw_naive = np.asarray(jax.jit(jax.grad(
        lambda p: jnp.sum(jnp.sin(xla_train_edge(p)))))(ptse))
    gg = np.asarray(jax.jit(jax.grad(
        lambda p: jnp.sum(jnp.sin(fused_train_edge(p)))))(ptse))
    gw_n = max(float(np.linalg.norm(gw)), 1e-9)
    rel_g = float(np.linalg.norm(gg - gw)) / gw_n
    rel_g_max = float(np.max(np.abs(gg - gw)) /
                      max(float(np.max(np.abs(gw))), 1e-9))
    vjp_bug = float(np.linalg.norm(gw_naive - gw)) / gw_n

    # routing diagnostic: fraction of (row, channel) positions whose
    # max the fused forward routed to a different slot than XLA's
    # argmax — the near-tie flips the module doc predicts from the
    # bf16 gather envelope. Each flip moves an O(1) cotangent, so
    # grad_rel_err ~ sqrt(2 * slot_flip_rate) if flips explain it.
    from alignnet3d_tpu.ops.edge_train_kernels import _fused_fwd_impl
    interp = jax.default_backend() == "cpu"
    slots = np.asarray(jax.jit(lambda p: _fused_fwd_impl(
        p, idxe, w1, b1, g1, be1, w2, b2, g2, be2,
        1e-3, 256, interp)[2][10])(ptse))[:, :ne, :]
    h2_x = np.asarray(jax.jit(
        lambda p: xla_train_edge(p, lambda h, axis: h))(ptse))
    flip = float(np.mean(slots.astype(np.int32)
                         != np.argmax(h2_x, axis=2)))

    def probe_g(o):
        return o[:, :1, :1] * 1e-9

    ms_f_t = timed_ms(lambda p: jax.grad(
        lambda q: jnp.sum(fused_train_edge(q)))(p), ptse, probe_g)
    ms_x_t = timed_ms(lambda p: jax.grad(
        lambda q: jnp.sum(xla_train_edge(q)))(p), ptse, probe_g)
    record("edge_train_fused", (rel_t < 2e-2) and (rel_g < 0.15),
           rel_err=round(rel_t, 7), grad_rel_err=round(rel_g, 7),
           grad_rel_err_max=round(rel_g_max, 7),
           slot_flip_rate=round(flip, 7),
           xla_jit_max_vjp_err=round(vjp_bug, 7),
           ms_fused_fwdbwd=round(ms_f_t, 3), ms_xla_fwdbwd=round(ms_x_t, 3),
           shape=f"B{be} N{ne} k{ke}", fused_wins=bool(ms_f_t < ms_x_t))


def _check_edge_train_fused_highest(record, rng, jnp, pts, idx,
                                    w1, b1, w2, b2, n,
                                    name="edge_train_fused_highest"):
    """LOGIC exactness of the fused training kernel: both the kernel
    (``precision='highest'`` threads f32-exact passes into every MXU
    matmul) and the stable_max XLA reference run at HIGHEST matmul
    precision, so bf16 near-tie argmax routing flips cannot masquerade
    as — or hide — real bugs (the round-4 slot-map bug and the round-5
    index-corruption bug would both fail this row loudly). Gate 1e-3:
    residual noise is f32 reassociation plus at most a handful of
    exact-tie flips. No timing (HIGHEST is ~3-6x passes, not shipped;
    production runs default precision, gated by the envelope row)."""
    import jax

    from alignnet3d_tpu.ops.edge_train_kernels import fused_edge_stage_train
    from alignnet3d_tpu.ops.knn import get_edge_feature
    from alignnet3d_tpu.ops.stable_max import stable_max

    c1, c2 = w1.shape[1], w2.shape[1]
    g1 = jnp.asarray(1.0 + 0.1 * rng.normal(size=(c1,)), jnp.float32)
    be1 = jnp.asarray(0.1 * rng.normal(size=(c1,)), jnp.float32)
    g2 = jnp.asarray(1.0 + 0.1 * rng.normal(size=(c2,)), jnp.float32)
    be2 = jnp.asarray(0.1 * rng.normal(size=(c2,)), jnp.float32)

    def xla_train_edge(p):
        e = get_edge_feature(p, idx)
        pre1 = e @ w1 + b1
        mu1 = jnp.mean(pre1, axis=(0, 1, 2))
        v1 = jnp.mean(jnp.square(pre1), axis=(0, 1, 2)) - jnp.square(mu1)
        h1 = jax.nn.relu((pre1 - mu1) * jax.lax.rsqrt(v1 + 1e-3) * g1 + be1)
        pre2 = h1 @ w2 + b2
        mu2 = jnp.mean(pre2, axis=(0, 1, 2))
        v2 = jnp.mean(jnp.square(pre2), axis=(0, 1, 2)) - jnp.square(mu2)
        h2 = jax.nn.relu((pre2 - mu2) * jax.lax.rsqrt(v2 + 1e-3) * g2 + be2)
        return stable_max(h2, axis=2)

    def fused_train_edge(p):
        return fused_edge_stage_train(p, idx, w1, b1, g1, be1,
                                      w2, b2, g2, be2,
                                      precision="highest")[0]

    with jax.default_matmul_precision("highest"):
        want_t = np.asarray(jax.jit(xla_train_edge)(pts))
        gw = np.asarray(jax.jit(jax.grad(
            lambda p: jnp.sum(jnp.sin(xla_train_edge(p)))))(pts))
    got_t = np.asarray(jax.jit(fused_train_edge)(pts))
    gg = np.asarray(jax.jit(jax.grad(
        lambda p: jnp.sum(jnp.sin(fused_train_edge(p)))))(pts))
    rel_t = float(np.max(np.abs(got_t - want_t)) / np.max(np.abs(want_t)))
    rel_g = float(np.linalg.norm(gg - gw)) / max(
        float(np.linalg.norm(gw)), 1e-9)
    rel_g_max = float(np.max(np.abs(gg - gw)) /
                      max(float(np.max(np.abs(gw))), 1e-9))
    record(name, (rel_t < 1e-3) and (rel_g < 1e-3),
           rel_err=round(rel_t, 9), grad_rel_err=round(rel_g, 9),
           grad_rel_err_max=round(rel_g_max, 9),
           shape=f"B{pts.shape[0]} N{n} k{idx.shape[-1]}")


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "onchip_smoke.json")

    import jax
    import jax.numpy as jnp

    backend = jax.default_backend()
    report = {"backend": backend, "date": time.strftime("%Y-%m-%d %H:%M"),
              "checks": {}}
    ok_all = True

    def record(name, ok, **extra):
        nonlocal ok_all
        ok_all &= bool(ok)
        report["checks"][name] = {"ok": bool(ok), **extra}
        print(f"[smoke] {name}: {'OK' if ok else 'FAIL'} {extra}", flush=True)

    rng = np.random.default_rng(0)

    # --- 1. Pallas kNN: exactness on 3 shapes + timing at train shape ---
    from alignnet3d_tpu.ops.knn import knn, pairwise_distance
    from alignnet3d_tpu.ops.knn_kernels import knn_points_pallas

    k = 20
    exact = True
    for (b, n) in ((4, 512), (2, 500), (2, 1024)):
        pts = jnp.asarray(rng.normal(size=(b, n, 3)), jnp.float32)
        got = np.asarray(knn_points_pallas(pts, k))
        want = np.asarray(knn(pairwise_distance(pts), k))
        exact &= bool(np.array_equal(got, want))
    b, n = 128, 512
    pts = jnp.asarray(rng.normal(size=(b, n, 3)), jnp.float32)

    def probe(idx):
        return (idx[:, :1, :1] % 2).astype(jnp.float32) * 1e-9

    ms_pallas = timed_ms(lambda p: knn_points_pallas(p, k), pts, probe)
    ms_xla = timed_ms(lambda p: knn(pairwise_distance(p), k), pts, probe)
    record("knn_pallas", exact, ms_pallas=round(ms_pallas, 3),
           ms_xla=round(ms_xla, 3), shape=f"B{b} N{n} k{k}",
           pallas_wins=bool(ms_pallas < ms_xla))

    # --- 2. Pallas NN argmin (ICP correspondences) ---
    from alignnet3d_tpu.ops.nn_kernels import nn_argmin_pallas

    src = jnp.asarray(rng.normal(size=(1500, 3)), jnp.float32)
    dst = jnp.asarray(rng.normal(size=(1200, 3)), jnp.float32)
    mask = jnp.asarray(rng.random(1200) > 0.1)
    idx, d2 = nn_argmin_pallas(src, dst, mask)
    idx, d2 = np.asarray(idx), np.asarray(d2)
    full = jnp.sum((src[:, None, :] - dst[None, :, :]) ** 2, axis=-1)
    full = jnp.where(mask[None, :], full, jnp.inf)
    want_idx = np.asarray(jnp.argmin(full, axis=1))
    want_d2 = np.asarray(jnp.min(full, axis=1))
    idx_bad = int(np.sum(idx != want_idx))
    # ties / f32 -summation-order noise: the chosen index may differ while
    # its distance is equally minimal — compare the CHOSEN distances
    chosen_d2 = np.asarray(full)[np.arange(len(idx)), idx]
    d2_ok = np.allclose(chosen_d2, want_d2, rtol=1e-4, atol=1e-5)
    val_ok = np.allclose(d2, chosen_d2, rtol=1e-4, atol=1e-5)
    record("nn_argmin", d2_ok and val_ok, idx_mismatch=idx_bad,
           max_chosen_d2_err=round(float(np.max(np.abs(chosen_d2 - want_d2))), 8),
           max_val_err=round(float(np.max(np.abs(d2 - chosen_d2))), 8))

    # --- 3. int8 dynamic-quant chain vs f32 ---
    from alignnet3d_tpu.ops.quant import (
        _dense_int8,
        _dense_int8_nonneg,
        fused_pointnet_int8,
        quantize_weights_int8,
    )

    sizes = [(3, 64), (64, 128), (128, 1024)]
    ws = [rng.normal(size=s).astype(np.float32) / np.sqrt(s[0])
          for s in sizes]
    bs_ = [rng.normal(size=s[1]).astype(np.float32) * 0.01 for s in sizes]
    pts8 = jnp.asarray(rng.normal(size=(32, 256, 3)), jnp.float32)
    h = pts8
    for w, bias in zip(ws, bs_):
        h = jnp.maximum(h @ jnp.asarray(w) + jnp.asarray(bias), 0.0)
    want = np.asarray(jnp.max(h, axis=1))
    got = np.asarray(fused_pointnet_int8(
        pts8, quantize_weights_int8(ws), [jnp.asarray(x) for x in bs_]))
    # SCALE-relative error (max-rel on near-zero features is meaningless
    # for 8-bit math — the first smoke run tripped on exactly that)
    rel = float(np.max(np.abs(got - want)) / np.max(np.abs(want)))
    # unsigned-vs-symmetric on a nonneg activation (advisor round-3)
    act = jnp.maximum(jnp.asarray(rng.normal(size=(64, 128)), jnp.float32), 0)
    wq, wsc = quantize_weights_int8([ws[2]])[0]
    ref = np.asarray(act @ jnp.asarray(ws[2]))
    e_sym = float(np.mean(np.abs(np.asarray(_dense_int8(act, wq, wsc)) - ref)))
    e_uns = float(np.mean(np.abs(
        np.asarray(_dense_int8_nonneg(act, wq, wsc)) - ref)))
    record("int8_quant", rel < 0.05 and e_uns <= e_sym * 1.05,
           rel_err=round(rel, 4), mae_sym=round(e_sym, 5),
           mae_unsigned=round(e_uns, 5))

    # --- 4. BN-folded serving vs model.apply (eval mode, f32) ---
    # FOLDING correctness is tested at HIGHEST matmul precision (TPU f32
    # matmuls default to bf16-pass arithmetic, which amplifies through
    # the 3-stage composition and is NOT a folding bug — the first smoke
    # run measured 0.07 max diff at default precision; both paths ship
    # at default/bf16 and their accuracy is measured at eval level, not
    # elementwise). The default-precision delta is recorded as info.
    from alignnet3d_tpu.models.alignnet import AlignNet, ModelSpec
    from alignnet3d_tpu.serving import build_inference_fn

    spec = ModelSpec(num_points=128, compute_dtype="float32")
    model = AlignNet(spec=spec)
    a = jnp.asarray(rng.normal(size=(4, 128, 3)), jnp.float32)
    bcl = jnp.asarray(rng.normal(size=(4, 128, 3)), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        a, bcl, train=False, momentum=jnp.float32(0.9))

    def _diff(precision):
        with jax.default_matmul_precision(precision):
            want = jax.jit(lambda a, b: model.apply(
                variables, a, b, train=False,
                momentum=jnp.float32(0.9)))(a, bcl)
            fn = jax.jit(build_inference_fn(spec, variables,
                                            compute_dtype=jnp.float32))
            got = fn(a, bcl)
        worst = 0.0
        for key in ("pred_translations", "pred_s2_pc1centers",
                    "pred_pc1angle_logits", "pred_remaining_angle_logits"):
            worst = max(worst, float(np.max(np.abs(
                np.asarray(got[key]) - np.asarray(want[key])))))
        return worst

    worst_hi = _diff("float32")
    worst_def = _diff("default")
    record("folded_serving", worst_hi < 2e-3,
           max_abs_diff_f32=round(worst_hi, 6),
           max_abs_diff_default=round(worst_def, 6))

    # --- 5. fused edge-conv stage (dgcnn serving) vs XLA graph + timing ---
    from alignnet3d_tpu.ops.edge_conv_kernels import fused_edge_stage
    from alignnet3d_tpu.ops.knn import get_edge_feature

    be, ne, ke = 128, 512, 20
    ptse = jnp.asarray(rng.normal(size=(be, ne, 3)), jnp.float32)
    idxe = knn(pairwise_distance(ptse), ke)
    w1 = jnp.asarray(rng.normal(size=(6, 64)) / 2.0, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(64,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(64, 128)) / 8.0, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(128,)) * 0.1, jnp.float32)

    def xla_edge(p):
        e = get_edge_feature(p, idxe)
        h = jnp.maximum(e @ w1 + b1, 0.0)
        h = jnp.maximum(h @ w2 + b2, 0.0)
        return jnp.max(h, axis=2)

    want_e = np.asarray(jax.jit(xla_edge)(ptse))
    got_e = np.asarray(fused_edge_stage(ptse, idxe, w1, b1, w2, b2))
    rel_e = float(np.max(np.abs(got_e - want_e)) / np.max(np.abs(want_e)))

    def probe_e(o):
        return o[:, :1, :1] * 1e-9

    ms_fused = timed_ms(
        lambda p: fused_edge_stage(p, idxe, w1, b1, w2, b2), ptse, probe_e)
    ms_xla_e = timed_ms(xla_edge, ptse, probe_e)
    # tolerance covers bf16-pass matmul rounding (default TPU f32
    # precision) with different contraction orderings in the two paths
    record("edge_conv_fused", rel_e < 1e-2, rel_err=round(rel_e, 7),
           ms_fused=round(ms_fused, 3), ms_xla=round(ms_xla_e, 3),
           shape=f"B{be} N{ne} k{ke}",
           fused_wins=bool(ms_fused < ms_xla_e))

    # --- 6. fused TRAINING edge stage (fwd+bwd custom VJP) vs XLA graph ---
    # A compile failure here (the round-4 warm session hit a scoped-VMEM
    # OOM in the backward pallas_call) must still produce a recorded FAIL
    # + written JSON — the fused_probe gate reads this file.
    try:
        _check_edge_train_fused(record, timed_ms, rng, jnp, ptse, idxe,
                                w1, b1, w2, b2, be, ne, ke)
    except Exception as e:  # noqa: BLE001 — any kernel/compile error
        record("edge_train_fused", False, error=repr(e)[:400])

    report["ok"] = ok_all
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(f"[smoke] {'ALL OK' if ok_all else 'FAILURES'} -> {out_path}",
          flush=True)
    return 0 if ok_all else 1


if __name__ == "__main__":
    raise SystemExit(main())
