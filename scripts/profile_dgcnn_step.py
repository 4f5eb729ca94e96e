"""Per-stage decomposition of the DGCNN training step (round-4 probe
follow-up: docs/RESULTS.md measured the end-to-end premium at 4.1x while
the per-backbone numbers explain only ~100 of the 261 ms/step delta —
this script locates the rest on the live backend).

Times, with the chained-scan protocol (tunnel-safe):
  - kNN graph build alone (pallas + xla) at the stacked-view shape
  - the two-layer edge stage: naive XLA train graph fwd and fwd+bwd,
    and the fused training kernel (ops/edge_train_kernels.py) if present
  - DGCNNBackbone vs PointNetBackbone fwd / fwd+bwd per stage size
  - full model loss value_and_grad for both backbones

Writes /root/data/dgcnn_profile.json and prints one row per entry.
Run ONLY through the serialized TPU queue (CLAUDE.md tunnel gotchas).
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

N_ITERS = 10
B_PAIRS = 128          # training batch (pairs)
B_STACK = 256          # stacked views through one encoder
N_PTS = 512


def timed_ms(fn, feed, probe):
    import jax

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


def main():
    import jax
    import jax.numpy as jnp

    from alignnet3d_tpu.models.backbones import (
        DGCNNBackbone,
        PointNetBackbone,
    )
    from alignnet3d_tpu.ops.knn import knn, pairwise_distance
    from alignnet3d_tpu.ops.knn_kernels import knn_points_pallas

    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(size=(B_STACK, N_PTS, 3)), jnp.float32)
    report = {"backend": jax.default_backend(), "b_stack": B_STACK,
              "n": N_PTS, "rows": {}}

    def rec(name, ms):
        report["rows"][name] = round(ms, 3)
        print(f"[profile] {name:42s} {ms:8.3f} ms", flush=True)

    def p_first(o):
        if isinstance(o, tuple):
            o = o[0]
        o = o.astype(jnp.float32)
        return o.reshape(-1)[0].reshape(1, 1, 1) * jnp.ones_like(pts[:1, :1, :1]) * 1e-9

    rec("knn_pallas_B256", timed_ms(
        lambda p: knn_points_pallas(p, 20).astype(jnp.float32), pts, p_first))
    rec("knn_xla_B256", timed_ms(
        lambda p: knn(pairwise_distance(p), 20).astype(jnp.float32),
        pts, p_first))

    stages = {"s1": (64, 128, 256), "s2": (64, 128, 512),
              "emb": (64, 128, 1024)}
    for label, maker in (
            ("dgcnn", lambda ls: DGCNNBackbone(layer_sizes=ls)),
            ("dgcnn_fused", lambda ls: DGCNNBackbone(layer_sizes=ls,
                                                     fused_train=True)),
            ("pointnet", lambda ls: PointNetBackbone(layer_sizes=ls)),
    ):
        for sname, ls in stages.items():
            mod = maker(ls)
            variables = mod.init({"params": jax.random.PRNGKey(0)}, pts[:2],
                                 train=True, momentum=0.9)

            def fwd(p, mod=mod, variables=variables):
                out, _ = mod.apply(variables, p, train=True, momentum=0.9,
                                   mutable=["batch_stats"])
                return out

            def fwdbwd(p, mod=mod, variables=variables):
                def loss(q):
                    out, _ = mod.apply(variables, q, train=True,
                                       momentum=0.9,
                                       mutable=["batch_stats"])
                    return jnp.sum(out.astype(jnp.float32))

                return jax.grad(loss)(p)

            rec(f"{label}_{sname}_fwd", timed_ms(fwd, pts, p_first))
            rec(f"{label}_{sname}_fwdbwd", timed_ms(fwdbwd, pts, p_first))

    out_path = "/root/data/dgcnn_profile.json"
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(f"[profile] -> {out_path}", flush=True)


if __name__ == "__main__":
    main()
