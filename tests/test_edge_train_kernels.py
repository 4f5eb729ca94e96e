"""Interpret-mode exactness of the fused TRAINING edge stage
(ops/edge_train_kernels.py) against the naive XLA graph: forward values,
batch statistics, and every gradient (input + all 8 params)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alignnet3d_tpu.ops.edge_train_kernels import fused_edge_stage_train
from alignnet3d_tpu.ops.knn import get_edge_feature, knn, pairwise_distance

EPS = 1e-3


def _naive(f, idx, w1, b1, g1, be1, w2, b2, g2, be2):
    """Reference: materialized edge tensor, batch-stat BN, jnp max."""
    edge = get_edge_feature(f, idx)
    pre1 = edge @ w1 + b1
    mu1 = jnp.mean(pre1, axis=(0, 1, 2))
    var1 = jnp.mean(jnp.square(pre1), axis=(0, 1, 2)) - jnp.square(mu1)
    h1 = jax.nn.relu((pre1 - mu1) * jax.lax.rsqrt(var1 + EPS) * g1 + be1)
    pre2 = h1 @ w2 + b2
    mu2 = jnp.mean(pre2, axis=(0, 1, 2))
    var2 = jnp.mean(jnp.square(pre2), axis=(0, 1, 2)) - jnp.square(mu2)
    h2 = jax.nn.relu((pre2 - mu2) * jax.lax.rsqrt(var2 + EPS) * g2 + be2)
    return jnp.max(h2, axis=2), (mu1, var1, mu2, var2)


def _random_problem(b=2, n=40, c=3, c1=8, c2=16, k=5, seed=0):
    rng = np.random.default_rng(seed)
    f = jnp.asarray(rng.normal(size=(b, n, c)), jnp.float32)
    idx = knn(pairwise_distance(f), k)
    args = dict(
        w1=jnp.asarray(rng.normal(size=(2 * c, c1)) * 0.4, jnp.float32),
        b1=jnp.asarray(rng.normal(size=(c1,)) * 0.1, jnp.float32),
        g1=jnp.asarray(1.0 + 0.2 * rng.normal(size=(c1,)), jnp.float32),
        be1=jnp.asarray(0.1 * rng.normal(size=(c1,)), jnp.float32),
        w2=jnp.asarray(rng.normal(size=(c1, c2)) * 0.4, jnp.float32),
        b2=jnp.asarray(rng.normal(size=(c2,)) * 0.1, jnp.float32),
        g2=jnp.asarray(1.0 + 0.2 * rng.normal(size=(c2,)), jnp.float32),
        be2=jnp.asarray(0.1 * rng.normal(size=(c2,)), jnp.float32),
    )
    return f, idx, args


@pytest.mark.parametrize("n", [40, 128])
def test_forward_values_and_stats(n):
    f, idx, a = _random_problem(n=n)
    out, stats = fused_edge_stage_train(f, idx, **a, interpret=True)
    want, want_stats = _naive(f, idx, **a)
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-5)
    for got, exp, name in zip(stats, want_stats,
                              ["mu1", "var1", "mu2", "var2"]):
        np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-6,
                                   err_msg=name)


def test_gradients_match_naive_autodiff():
    f, idx, a = _random_problem()
    keys = list(a.keys())

    def loss_fused(f_, *vals):
        kw = dict(zip(keys, vals))
        out, _ = fused_edge_stage_train(f_, idx, **kw, interpret=True)
        return jnp.sum(jnp.sin(out * 0.7))

    def loss_naive(f_, *vals):
        kw = dict(zip(keys, vals))
        out, _ = _naive(f_, idx, **kw)
        return jnp.sum(jnp.sin(out * 0.7))

    vals = [a[k] for k in keys]
    gf = jax.grad(loss_fused, argnums=tuple(range(len(vals) + 1)))(f, *vals)
    gn = jax.grad(loss_naive, argnums=tuple(range(len(vals) + 1)))(f, *vals)
    for got, want, name in zip(gf, gn, ["f"] + keys):
        # atol floor: b1's true gradient is exactly 0 (BN absorbs the
        # pre-BN bias), so both sides are pure f32 cancellation noise
        np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-5,
                                   err_msg=name)


def test_stats_are_stop_gradient():
    """Using the returned stats in a loss contributes zero gradient —
    documented stop_gradient semantics (EMA consumers only)."""
    f, idx, a = _random_problem()

    def loss(f_):
        out, stats = fused_edge_stage_train(f_, idx, **a, interpret=True)
        return jnp.sum(out) + jnp.sum(stats[0]) * 5.0

    def loss_out_only(f_):
        out, _ = fused_edge_stage_train(f_, idx, **a, interpret=True)
        return jnp.sum(out)

    np.testing.assert_allclose(jax.grad(loss)(f), jax.grad(loss_out_only)(f),
                               rtol=1e-6, atol=0)


def test_flax_backbone_fused_train_parity():
    """DGCNNBackbone(fused_train=True) equals the naive module path:
    identical fresh init, forward values, EMA batch_stats updates, and
    parameter gradients (CPU interpret mode)."""
    from alignnet3d_tpu.models.backbones import DGCNNBackbone

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, 40, 3)), jnp.float32)
    kw = dict(layer_sizes=(8, 16, 24), k=5, knn_impl="xla")
    naive = DGCNNBackbone(**kw)
    fused = DGCNNBackbone(**kw, fused_train=True)

    v_n = naive.init({"params": jax.random.PRNGKey(0)}, x, train=True,
                     momentum=0.9)
    v_f = fused.init({"params": jax.random.PRNGKey(0)}, x, train=True,
                     momentum=0.9)
    for (pn, ln), (pf, lf) in zip(
            jax.tree_util.tree_leaves_with_path(v_n),
            jax.tree_util.tree_leaves_with_path(v_f)):
        assert pn == pf
        np.testing.assert_array_equal(ln, lf, err_msg=str(pn))

    out_n, mut_n = naive.apply(v_n, x, train=True, momentum=0.9,
                               mutable=["batch_stats"])
    out_f, mut_f = fused.apply(v_n, x, train=True, momentum=0.9,
                               mutable=["batch_stats"])
    np.testing.assert_allclose(out_f, out_n, rtol=2e-5, atol=2e-5)
    for (pn, ln), (pf, lf) in zip(
            jax.tree_util.tree_leaves_with_path(mut_n),
            jax.tree_util.tree_leaves_with_path(mut_f)):
        assert pn == pf
        np.testing.assert_allclose(lf, ln, rtol=1e-5, atol=1e-6,
                                   err_msg=str(pn))

    def loss(module, params):
        out = module.apply({**v_n, "params": params}, x, train=True,
                           momentum=0.9, mutable=["batch_stats"])[0]
        return jnp.sum(jnp.sin(out * 0.3))

    g_n = jax.grad(lambda p: loss(naive, p))(v_n["params"])
    g_f = jax.grad(lambda p: loss(fused, p))(v_n["params"])
    for (pn, ln), (pf, lf) in zip(
            jax.tree_util.tree_leaves_with_path(g_n),
            jax.tree_util.tree_leaves_with_path(g_f)):
        assert pn == pf
        np.testing.assert_allclose(lf, ln, rtol=5e-4, atol=5e-5,
                                   err_msg=str(pn))

    # eval mode ignores the flag (running-stats path, shared weights)
    e_n = naive.apply(v_n, x, train=False, momentum=0.9)
    e_f = fused.apply(v_n, x, train=False, momentum=0.9)
    np.testing.assert_allclose(e_f, e_n, rtol=1e-6, atol=1e-6)


@pytest.mark.slow
def test_multistrip_jit_gradients_match_stable_reference():
    """Multi-strip backward under jit — the exact configuration class the
    unit tests missed for two rounds (n<=128 is single-strip; the
    round-5 smoke self-test caught wrong gradients only at N=320/k=20/
    C=64,128). The reference is the stable_max-routed naive graph:
    jit(grad()) of the plain jnp.max graph is itself wrong on jax 0.9.0
    (ops/stable_max.py — XLA reduce_max VJP drops cotangents under
    remat), which masked this case."""
    from alignnet3d_tpu.ops.stable_max import stable_max

    f, idx, a = _random_problem(b=2, n=320, c=3, c1=64, c2=128, k=20,
                                seed=5)

    def loss_fused(f_):
        out, _ = fused_edge_stage_train(f_, idx, **a, interpret=True)
        return jnp.sum(jnp.sin(out * 0.7))

    def loss_stable(f_):
        edge = get_edge_feature(f_, idx)
        pre1 = edge @ a["w1"] + a["b1"]
        mu1 = jnp.mean(pre1, axis=(0, 1, 2))
        var1 = jnp.mean(jnp.square(pre1), axis=(0, 1, 2)) - jnp.square(mu1)
        h1 = jax.nn.relu(
            (pre1 - mu1) * jax.lax.rsqrt(var1 + EPS) * a["g1"] + a["be1"])
        pre2 = h1 @ a["w2"] + a["b2"]
        mu2 = jnp.mean(pre2, axis=(0, 1, 2))
        var2 = jnp.mean(jnp.square(pre2), axis=(0, 1, 2)) - jnp.square(mu2)
        h2 = jax.nn.relu(
            (pre2 - mu2) * jax.lax.rsqrt(var2 + EPS) * a["g2"] + a["be2"])
        return jnp.sum(jnp.sin(stable_max(h2, 2) * 0.7))

    gf = np.asarray(jax.jit(jax.grad(loss_fused))(f))
    gw = np.asarray(jax.jit(jax.grad(loss_stable))(f))
    rel = np.linalg.norm(gf - gw) / np.linalg.norm(gw)
    assert rel < 1e-4, f"multi-strip jit grad rel L2 {rel}"


@pytest.mark.parametrize("precision", [None, "highest"])
def test_precision_threading(precision):
    """The `precision` knob threads through every MXU matmul (kernel
    and host-side) without changing interpret-mode values or gradients
    (interpret mode is exact f32 at any setting; on-chip, 'highest'
    is what the smoke logic-exactness row runs both sides at)."""
    f, idx, a = _random_problem(n=40)
    out, stats = fused_edge_stage_train(f, idx, **a, interpret=True,
                                        precision=precision)
    want, _ = _naive(f, idx, **a)
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-5)
    g = jax.grad(lambda p: jnp.sum(jnp.sin(fused_edge_stage_train(
        p, idx, **a, interpret=True, precision=precision)[0])))(f)
    gw = jax.grad(lambda p: jnp.sum(jnp.sin(_naive(p, idx, **a)[0])))(f)
    np.testing.assert_allclose(g, gw, rtol=1e-4, atol=1e-5)
