#!/usr/bin/env python
"""DGCNN edge-conv efficiency probe: is a fused Pallas kernel warranted?

docs/RESULTS.md (chain14) attributes the DGCNN backbone's 4.1x per-epoch
premium over PointNet to the (B, N, k, C) edge-conv activations' HBM
round-trips, and notes a VMEM-resident fused edge-conv as the round-4
lever. Before building it (the pointnet_kernels lesson: XLA won that
fusion), this probe measures what XLA actually achieves on the edge-conv
chain: forward and forward+backward wall time under the chained-scan
protocol, XLA's own cost analysis (FLOPs, bytes accessed), and the
implied compute/bandwidth rooflines on v5e (~197 TFLOP/s bf16,
~819 GB/s HBM).

Run ONLY through the serialized TPU chain (CLAUDE.md tunnel gotchas).
Usage: python scripts/bench_dgcnn.py [B N]   (default 128 512)
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_ITERS = 20
PEAK_BF16 = 197e12
PEAK_HBM = 819e9


def main(argv):
    b = int(argv[0]) if argv else 128
    n = int(argv[1]) if len(argv) > 1 else 512

    import jax
    import jax.numpy as jnp

    from alignnet3d_tpu.models.backbones import DGCNNBackbone

    if jax.devices()[0].platform == "cpu":
        global N_ITERS
        N_ITERS, b, n = 2, 8, 64

    backbone = DGCNNBackbone(layer_sizes=(64, 128, 1024),
                             dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(size=(b, n, 3)), jnp.float32)
    variables = backbone.init(
        {"params": jax.random.PRNGKey(0)}, pts, train=False, momentum=0.9
    )

    def fwd(p):
        return backbone.apply(variables, p, train=False, momentum=0.9)

    def loss(params, p):
        out = backbone.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            p, train=False, momentum=0.9,
        )
        return jnp.sum(out.astype(jnp.float32) ** 2)

    grad = jax.grad(loss)

    def timed(fn, feed, probe):
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
        return best / N_ITERS

    # graph-build variants: XLA exact / XLA approx / fused Pallas kernel
    from alignnet3d_tpu.ops.knn import knn, pairwise_distance
    from alignnet3d_tpu.ops.knn_kernels import knn_points_pallas

    if jax.devices()[0].platform == "tpu":
        t_exact = timed(lambda p: knn(pairwise_distance(p), 20)
                        .astype(jnp.float32), pts,
                        lambda o: 1e-9 * jnp.mean(o)[None, None, None])
        t_approx = timed(lambda p: knn(pairwise_distance(p), 20, True)
                         .astype(jnp.float32), pts,
                         lambda o: 1e-9 * jnp.mean(o)[None, None, None])
        t_pallas = timed(lambda p: knn_points_pallas(p, 20)
                         .astype(jnp.float32), pts,
                         lambda o: 1e-9 * jnp.mean(o)[None, None, None])
        print(f"knn: XLA exact {t_exact*1e3:.3f} ms | XLA approx "
              f"{t_approx*1e3:.3f} ms | Pallas fused {t_pallas*1e3:.3f} ms")
        for tile in (128, 512):
            tt = timed(lambda p, t=tile: knn_points_pallas(p, 20, tm=t)
                       .astype(jnp.float32), pts,
                       lambda o: 1e-9 * jnp.mean(o)[None, None, None])
            print(f"     Pallas tm={tile}: {tt*1e3:.3f} ms")

    lowered = jax.jit(fwd).lower(pts).compile()
    ca = lowered.cost_analysis()
    flops = ca.get("flops", float("nan"))
    bytes_acc = ca.get("bytes accessed", float("nan"))

    t_fwd = timed(fwd, pts, lambda o: 1e-6 * jnp.mean(o)[None, None, None])

    # fwd+bwd timed separately (scan carries the input, probes a grad leaf)
    @partial(jax.jit, static_argnums=(1,))
    def chained_grad(p, iters):
        def body(carry, _):
            g = grad(variables["params"], carry)
            leaf = jax.tree_util.tree_leaves(g)[0]
            return carry + 1e-9 * jnp.mean(leaf), 0.0

        final, _ = jax.lax.scan(body, p, None, length=iters)
        return final

    np.asarray(chained_grad(pts, N_ITERS))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(chained_grad(pts, N_ITERS))
        best = min(best, time.perf_counter() - t0)
    t_grad = best / N_ITERS

    gca = jax.jit(
        lambda p: jax.tree_util.tree_leaves(grad(variables["params"], p))[0]
    ).lower(pts).compile().cost_analysis()

    print(f"DGCNN backbone (64,128,1024) k=20 B={b} N={n} bf16")
    print(f"forward : {t_fwd*1e3:8.3f} ms | XLA flops={flops:.3e} "
          f"bytes={bytes_acc:.3e}")
    print(f"  -> achieved {flops/t_fwd/1e12:6.1f} TF/s "
          f"({100*flops/t_fwd/PEAK_BF16:4.1f}% peak) | "
          f"{bytes_acc/t_fwd/1e9:6.1f} GB/s "
          f"({100*bytes_acc/t_fwd/PEAK_HBM:4.1f}% HBM)")
    gflops = gca.get("flops", float("nan"))
    gbytes = gca.get("bytes accessed", float("nan"))
    print(f"fwd+bwd : {t_grad*1e3:8.3f} ms | XLA flops={gflops:.3e} "
          f"bytes={gbytes:.3e}")
    print(f"  -> achieved {gflops/t_grad/1e12:6.1f} TF/s "
          f"({100*gflops/t_grad/PEAK_BF16:4.1f}% peak) | "
          f"{gbytes/t_grad/1e9:6.1f} GB/s "
          f"({100*gbytes/t_grad/PEAK_HBM:4.1f}% HBM)")
    edge_act = b * n * 20 * (64 + 128) * 2  # bf16 bytes of edge activations
    print(f"(edge activations h1+h2 one materialization = "
          f"{edge_act/1e6:.0f} MB -> {edge_act/PEAK_HBM*1e3:.2f} ms "
          f"per HBM round-trip at peak)")


if __name__ == "__main__":
    main(sys.argv[1:])
