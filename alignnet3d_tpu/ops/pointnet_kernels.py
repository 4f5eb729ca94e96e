"""Pallas TPU kernel: fused per-point MLP stack + max-over-points reduce.

The reference's hot op is the "shared MLP" — 1xC conv2d stacks with
BN+ReLU followed by an N-wide maxpool (reference models/tp8.py:49-59,
utils/tf_util.py:112,350). At inference the BN folds into the dense weights
(see ``alignnet3d_tpu.serving``), so the whole backbone collapses to
``max_N(relu(...relu(x W1 + b1)... W_L + b_L))``.

This kernel fuses that chain into one VMEM-resident pass: the grid walks
(batch-tile, point-chunk); each step runs the full L-layer MLP on a
(TB*TN, F) tile on the MXU (bf16 inputs, fp32 accumulation) and
max-accumulates into the (TB, F_out) output block, so intermediate
activations never touch HBM.

Measured on TPU v5e (B=1024, N=512, dims 3-64-128-1024): bit-exact vs the
XLA path, but XLA's own fusion wins — 1.74 ms (84 TFLOP/s, ~86% of f32
roofline) vs 2.75 ms for this kernel. XLA already keeps the chain fused
with activations on-chip, so the Pallas path is OFF by default
(tpu.use_pallas) and serves as the template for ops XLA fuses poorly.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fused_pointnet_xla(points, weights, biases, compute_dtype=jnp.bfloat16):
    """Reference implementation: relu-dense chain + max over points.

    points: (B, N, C); weights[i]: (C_i, C_{i+1}); biases[i]: (C_{i+1},).
    Returns (B, F_last) float32.
    """
    h = points.astype(compute_dtype)
    for w, b in zip(weights, biases):
        h = jnp.dot(h, w.astype(compute_dtype),
                    preferred_element_type=jnp.float32)
        h = jnp.maximum(h + b.astype(jnp.float32), 0.0)
        h = h.astype(compute_dtype)
    return jnp.max(h.astype(jnp.float32), axis=1)


def _kernel(x_ref, *refs, num_layers: int, tb: int, tn: int,
            compute_dtype):
    w_refs = refs[:num_layers]
    b_refs = refs[num_layers: 2 * num_layers]
    out_ref = refs[2 * num_layers]

    j = pl.program_id(1)
    x = x_ref[...].astype(compute_dtype)
    h = x.reshape(tb * tn, x.shape[-1])
    for li in range(num_layers):
        w = w_refs[li][...].astype(compute_dtype)
        acc = jnp.dot(h, w, preferred_element_type=jnp.float32)
        acc = jnp.maximum(acc + b_refs[li][...].astype(jnp.float32), 0.0)
        h = acc.astype(compute_dtype)
    f_out = h.shape[-1]
    hmax = jnp.max(h.astype(jnp.float32).reshape(tb, tn, f_out), axis=1)

    @pl.when(j == 0)
    def _():
        out_ref[...] = hmax

    @pl.when(j > 0)
    def _():
        out_ref[...] = jnp.maximum(out_ref[...], hmax)


@partial(jax.jit, static_argnames=("tb", "tn", "compute_dtype", "interpret"))
def fused_pointnet_pallas(points, weights, biases, tb: int = 8,
                          tn: int = 128, compute_dtype=jnp.bfloat16,
                          interpret: bool = False):
    """Pallas path. Requires B % tb == 0 and N % tn == 0 (callers pad)."""
    b, n, c = points.shape
    assert b % tb == 0 and n % tn == 0, (b, n, tb, tn)
    num_layers = len(weights)
    f_out = weights[-1].shape[-1]

    grid = (b // tb, n // tn)
    in_specs = [
        pl.BlockSpec((tb, tn, c), lambda i, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
    ]
    for w in weights:
        in_specs.append(
            pl.BlockSpec(w.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM)
        )
    for bias in biases:
        in_specs.append(
            pl.BlockSpec(bias.shape, lambda i, j: (0,),
                         memory_space=pltpu.VMEM)
        )
    out_spec = pl.BlockSpec((tb, f_out), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)

    kernel = partial(_kernel, num_layers=num_layers, tb=tb, tn=tn,
                     compute_dtype=compute_dtype)
    flops = 2 * b * n * sum(
        int(w.shape[0]) * int(w.shape[1]) for w in weights
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, f_out), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=points.size * 4 + b * f_out * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(points, *weights, *biases)


def fused_pointnet(points, weights, biases, use_pallas: bool = False,
                   compute_dtype=jnp.bfloat16, interpret: bool = False):
    """Dispatch: pallas when requested and shapes allow, else XLA."""
    b, n, _ = points.shape
    if use_pallas:
        tb = next((t for t in (8, 4, 2, 1) if b % t == 0), 1)
        tn = next((t for t in (128, 64, 32, 16, 8) if n % t == 0), None)
        if tn is not None:
            return fused_pointnet_pallas(
                points, tuple(weights), tuple(biases), tb=tb, tn=tn,
                compute_dtype=compute_dtype, interpret=interpret,
            )
    return fused_pointnet_xla(points, weights, biases, compute_dtype)
