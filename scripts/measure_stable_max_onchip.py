#!/usr/bin/env python
"""Measure ON CHIP the XLA reduce_max VJP cotangent-drop bug on the real
AlignNet training gradient, and the stable_max workaround's agreement.

Round-5 finding (ops/stable_max.py, tests/test_stable_max.py): on jax
0.9.0 CPU, ``jit(grad(...))`` of graphs that differentiate through
``jnp.max`` drops gradient mass (reduce_max VJP equality mask vs
rematerialized operands). On CPU the full AlignNet training gradient
differs 1.7% max-norm / 40% of elements between jit and eager; eager
matches central finite differences. This script records the TPU
magnitude of the same comparison — the decisive datum for flipping
``model.options.stable_max_grad`` on by default:

  g_eager   grad of the plain-max training loss, EAGER (per-primitive
            dispatch: the reduce_max VJP sees real buffers, no remat —
            ground truth, FD-certified on CPU)
  g_jit     same loss under jit — the production training path to date
  g_stable  stable_max-routed loss under jit — the workaround

Interpretation: jit_plain vs jit_stable is the routing-sensitivity
discriminator. If they are bit-identical (CPU PointNet measures exactly
that), the compiler kept the pool operands materialized and the bug
does not bite this graph — any jit-vs-eager delta is generic fusion
reordering, and the flag is a no-op. If they diverge, compare each
against eager: the drop bug pulls jit_plain AWAY from eager while
jit_stable stays close. Measured per backbone — the FD-certified
droppage case is the DGCNN edge max (tests/test_stable_max.py), so the
dgcnn rows are the decisive ones.

Writes docs/stable_max_onchip.json (or argv[1]). Purely informational
(always exits 0 on success); run only through the serialized TPU queue
(CLAUDE.md tunnel gotchas). Reference semantics unaffected: forward
values are bit-identical either way (reference tp8.py pools via
tf.reduce_max; TF's VJP has no such remat hazard to reproduce).
"""

from __future__ import annotations

import json
import os
import sys
import time
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "stable_max_onchip.json")

    import jax
    import jax.numpy as jnp

    from alignnet3d_tpu.config import load_config
    from alignnet3d_tpu.models import AlignNet, ModelSpec
    from alignnet3d_tpu.models.losses import LossSpec, get_loss

    cfg = load_config("configs/SynthCars160kCenterSup.json")
    lspec = LossSpec.from_config(cfg)
    b, n = 8, 128  # small: the eager arm dispatches per-primitive

    rng = np.random.default_rng(0)
    pcs1 = jnp.asarray(rng.normal(size=(b, n, 3)), jnp.float32)
    pcs2 = jnp.asarray(rng.normal(size=(b, n, 3)), jnp.float32)
    trans = jnp.asarray(0.5 * rng.normal(size=(b, 3)), jnp.float32)
    rel = jnp.asarray(rng.uniform(-np.pi, np.pi, size=(b,)), jnp.float32)
    c1 = jnp.asarray(0.3 * rng.normal(size=(b, 3)), jnp.float32)
    c2 = jnp.asarray(0.3 * rng.normal(size=(b, 3)), jnp.float32)
    a1 = jnp.asarray(rng.uniform(-np.pi, np.pi, size=(b,)), jnp.float32)
    a2 = jnp.asarray(rng.uniform(-np.pi, np.pi, size=(b,)), jnp.float32)

    def flat(g):
        return np.concatenate(
            [np.asarray(x, np.float64).ravel()
             for x in jax.tree_util.tree_leaves(g)])

    report = {
        "backend": jax.default_backend(),
        "date": time.strftime("%Y-%m-%d %H:%M"),
        "shape": f"B{b} N{n}",
        "backbones": {},
    }

    for backbone in ("pointnet", "dgcnn"):
        spec = replace(ModelSpec.from_config(cfg), num_points=n,
                       backbone=backbone)
        model_plain = AlignNet(spec)
        model_stable = AlignNet(replace(spec, stable_max_grad=True))
        variables = model_plain.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            pcs1, pcs2, train=False)
        params, stats = variables["params"], variables["batch_stats"]
        drop = jax.random.PRNGKey(2)  # same mask in all three arms

        def loss_with(model, stats=stats, drop=drop):
            def f(p):
                out, _ = model.apply(
                    {"params": p, "batch_stats": stats}, pcs1, pcs2,
                    train=True, momentum=0.9, mutable=["batch_stats"],
                    rngs={"dropout": drop})
                loss, _aux = get_loss(pcs1, pcs2, trans, rel, c1, c2,
                                      a1, a2, out, spec=lspec)
                return loss
            return f

        t0 = time.time()
        g_eager = flat(jax.grad(loss_with(model_plain))(params))
        t_eager = time.time() - t0
        print(f"[stable_max] {backbone} eager arm done in {t_eager:.1f}s",
              flush=True)
        g_jit = flat(jax.jit(jax.grad(loss_with(model_plain)))(params))
        g_stable = flat(jax.jit(jax.grad(loss_with(model_stable)))(params))

        nrm = max(float(np.linalg.norm(g_eager)), 1e-12)
        mx = max(float(np.max(np.abs(g_eager))), 1e-12)
        thresh = 1e-7 * mx

        def row(g, ref, nrm=nrm, mx=mx, thresh=thresh):
            d = g - ref
            return {
                "rel_l2": round(float(np.linalg.norm(d)) / nrm, 7),
                "rel_max": round(float(np.max(np.abs(d))) / mx, 7),
                "frac_elems_differ": round(
                    float(np.mean(np.abs(d) > thresh)), 4),
            }

        report["backbones"][backbone] = {
            "n_grad_elems": int(g_eager.size),
            "eager_seconds": round(t_eager, 1),
            "jit_plain_vs_eager": row(g_jit, g_eager),
            "stable_jit_vs_eager": row(g_stable, g_eager),
            # the discriminator: bit-identical => bug doesn't bite here
            "jit_plain_vs_jit_stable": row(g_stable, g_jit),
        }
        print(json.dumps(report["backbones"][backbone]), flush=True)
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(f"[stable_max] wrote {out_path}:", flush=True)
    print(json.dumps(report, indent=1), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
