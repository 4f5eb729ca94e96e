#!/usr/bin/env python
"""Re-run ONLY on-chip smoke check 6 (fused TRAINING edge stage) and
patch its entry in docs/onchip_smoke.json in place.

Round-5 context: the full smoke at round open recorded edge_train_fused
FAIL (grad_rel_err 1.48) — TWO stacked causes, both since fixed:
(a) bf16 MXU rounding corrupting the backward's dynamic slot-row index
extraction for indices > 256 (edge_train_kernels._slot_idx, fixed to
integer VPU arithmetic), and (b) the check's REFERENCE gradient itself:
jit(grad()) of the naive jnp.max graph is wrong on jax 0.9.0 (XLA
reduce_max VJP drops cotangents under remat — FD-proven,
ops/stable_max.py); the check now references the stable_max-routed
graph and gates on relative L2 (see onchip_smoke._check_edge_train_fused
docstring). This script revalidates just that check in the queue's next
TPU slot without paying the other five checks' compile time, and adds a
second exactness row at the flagship DGCNN shape (N=1024) where 75% of
neighbor indices exceed the bf16-exact range.

Run ONLY through the serialized TPU queue (CLAUDE.md tunnel gotchas).
Usage: python scripts/smoke6_recheck.py [docs/onchip_smoke.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from onchip_smoke import _check_edge_train_fused, timed_ms  # noqa: E402


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "onchip_smoke.json")

    import jax
    import jax.numpy as jnp

    from alignnet3d_tpu.ops.knn import knn, pairwise_distance

    report = json.load(open(out_path))
    results = {}

    def record(name, ok, **extra):
        results[name] = {"ok": bool(ok), **extra}
        print(f"[smoke6] {name}: {'OK' if ok else 'FAIL'} {extra}",
              flush=True)

    rng = np.random.default_rng(5)
    be, ne, ke = 128, 512, 20
    tmeas = timed_ms
    if os.environ.get("SMOKE6_TINY"):
        # CPU mechanics self-test: tiny shapes, no timing (interpret-mode
        # Pallas is far too slow for the chained-scan timer)
        be, ne = 4, 320
        tmeas = lambda fn, feed, probe: 0.0  # noqa: E731
    ptse = jnp.asarray(rng.normal(size=(be, ne, 3)), jnp.float32)
    idxe = knn(pairwise_distance(ptse), ke)
    w1 = jnp.asarray(rng.normal(size=(6, 64)) / 2.0, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(64,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(64, 128)) / 8.0, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(128,)) * 0.1, jnp.float32)
    try:
        _check_edge_train_fused(record, tmeas, rng, jnp, ptse, idxe,
                                w1, b1, w2, b2, be, ne, ke)
    except Exception as e:  # compile failure must still record
        record("edge_train_fused", False, error=repr(e)[:300])

    # flagship-shape exactness row (no timing): N=1024 puts 75% of
    # neighbor indices above the bf16-exact integer range
    be2, ne2 = (2, 640) if os.environ.get("SMOKE6_TINY") else (32, 1024)
    pts2 = jnp.asarray(rng.normal(size=(be2, ne2, 3)), jnp.float32)
    idx2 = knn(pairwise_distance(pts2), ke)
    try:
        from alignnet3d_tpu.ops.edge_train_kernels import (
            fused_edge_stage_train,
        )
        g1 = jnp.asarray(1.0 + 0.1 * rng.normal(size=(64,)), jnp.float32)
        be_1 = jnp.asarray(0.1 * rng.normal(size=(64,)), jnp.float32)
        g2 = jnp.asarray(1.0 + 0.1 * rng.normal(size=(128,)), jnp.float32)
        be_2 = jnp.asarray(0.1 * rng.normal(size=(128,)), jnp.float32)

        from alignnet3d_tpu.ops.knn import get_edge_feature
        from alignnet3d_tpu.ops.stable_max import stable_max

        def xla_train_edge(p):
            # stable_max reference: jit(grad) of the plain jnp.max graph
            # is itself wrong (ops/stable_max.py module doc)
            e = get_edge_feature(p, idx2)
            pre1 = e @ w1 + b1
            mu1 = jnp.mean(pre1, axis=(0, 1, 2))
            v1 = jnp.mean(jnp.square(pre1), axis=(0, 1, 2)) - jnp.square(mu1)
            h1 = jax.nn.relu(
                (pre1 - mu1) * jax.lax.rsqrt(v1 + 1e-3) * g1 + be_1)
            pre2 = h1 @ w2 + b2
            mu2 = jnp.mean(pre2, axis=(0, 1, 2))
            v2 = jnp.mean(jnp.square(pre2), axis=(0, 1, 2)) - jnp.square(mu2)
            h2 = jax.nn.relu(
                (pre2 - mu2) * jax.lax.rsqrt(v2 + 1e-3) * g2 + be_2)
            return stable_max(h2, axis=2)

        def fused_train_edge(p):
            return fused_edge_stage_train(p, idx2, w1, b1, g1, be_1,
                                          w2, b2, g2, be_2)[0]

        gw = np.asarray(jax.jit(jax.grad(
            lambda p: jnp.sum(jnp.sin(xla_train_edge(p)))))(pts2))
        gg = np.asarray(jax.jit(jax.grad(
            lambda p: jnp.sum(jnp.sin(fused_train_edge(p)))))(pts2))
        rel_g = float(np.linalg.norm(gg - gw)) / max(
            float(np.linalg.norm(gw)), 1e-9)
        rel_g_max = float(np.max(np.abs(gg - gw)) /
                          max(float(np.max(np.abs(gw))), 1e-9))
        record("edge_train_fused_n1024", rel_g < 2e-2,
               grad_rel_err=round(rel_g, 7),
               grad_rel_err_max=round(rel_g_max, 7),
               shape=f"B{be2} N{ne2} k{ke}")
    except Exception as e:
        record("edge_train_fused_n1024", False, error=repr(e)[:300])

    report["checks"].update(results)
    report["date"] = time.strftime("%Y-%m-%d %H:%M")
    report["ok"] = all(c.get("ok") for c in report["checks"].values())
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(f"[smoke6] wrote {out_path} ok={report['ok']}", flush=True)
    return 0 if all(c.get("ok") for c in results.values()) else 1


if __name__ == "__main__":
    sys.exit(main())
