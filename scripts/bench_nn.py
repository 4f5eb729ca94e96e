"""Micro-benchmark: ICP nearest-neighbor argmin, XLA vs Pallas.

Times the hot op of batched ICP (icp/p2point.py:_nn_correspondences vs
ops/nn_kernels.py:nn_argmin_pallas) at the real workload shape: a batch
of pairs, full-cloud sizes, many chained iterations (tunnel-safe timing
as in bench.py — iterations chained in a lax.scan with a data
dependency, one host readback).

Run on the TPU chip: python scripts/bench_nn.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from alignnet3d_tpu.icp.p2point import _nn_correspondences
from alignnet3d_tpu.ops.nn_kernels import nn_argmin_pallas


def bench(fn, B, n1, n2, iters=20, label=""):
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.normal(size=(B, n1, 3)), jnp.float32)
    dst = jnp.asarray(rng.normal(size=(B, n2, 3)), jnp.float32)
    mask = jnp.ones((B, n2), bool)

    vfn = jax.vmap(fn, in_axes=(0, 0, 0))

    @jax.jit
    def chained(src, dst, mask):
        def body(carry, _):
            s = carry
            idx, d2 = vfn(s, dst, mask)
            # data dependency: nudge the source by the found distances
            s = s + (d2[..., None] * 1e-9)
            return s, d2[0, 0]

        out, probes = jax.lax.scan(body, src, None, length=iters)
        return probes

    np.asarray(chained(src, dst, mask))  # compile + warmup
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(chained(src, dst, mask))
        best = min(best, time.perf_counter() - t0)
    per_call_ms = best / iters * 1e3
    queries_per_s = B * n1 * iters / best
    print(f"{label:8s} B={B} n1={n1} n2={n2}: {per_call_ms:8.2f} ms/call "
          f"({queries_per_s/1e6:8.1f}M queries/s)")
    return per_call_ms


if __name__ == "__main__":
    print("devices:", jax.devices())
    for B, n in [(128, 1024), (128, 2048), (64, 4096)]:
        x = bench(_nn_correspondences, B, n, n, label="xla")
        p = bench(nn_argmin_pallas, B, n, n, label="pallas")
        print(f"  -> pallas speedup: {x / p:.2f}x")
