"""SPMD device mesh + sharding rules.

The reference has zero parallelism machinery (SURVEY.md §2: single
tf.Session on one GPU, dead ``is_dist`` BN flag). This module is the
greenfield TPU-native replacement:

- a 2-axis ``Mesh`` ``('dp', 'mp')``: data parallelism over ``dp`` (the
  per-pair workload is embarrassingly parallel; gradient psum rides ICI),
  tensor parallelism of the wide embedding layers over ``mp``;
- shape-based partition rules applied uniformly to params, optimizer
  moments, and BN statistics, so one rule tree shards the whole TrainState;
- jit with in/out shardings does the rest — XLA inserts the collectives.

No NCCL/MPI analogue exists or is needed; XLA collectives over ICI are the
communication backend.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# dense outputs at least this wide get their feature axis sharded over 'mp'
TP_THRESHOLD = 512


def make_mesh(dp: int = -1, mp: int = 1, devices=None) -> Mesh:
    """Build the ('dp', 'mp') mesh. ``dp=-1`` uses all remaining devices."""
    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    if mp <= 0:
        mp = 1
    if dp == -1:
        dp = n // mp
    assert dp * mp <= n, f"mesh {dp}x{mp} needs {dp*mp} devices, have {n}"
    dev_array = np.asarray(devices[: dp * mp]).reshape(dp, mp)
    return Mesh(dev_array, ("dp", "mp"))


def leaf_pspec(leaf, tp_threshold: int = TP_THRESHOLD) -> P:
    """Partition rule for one array: shard wide feature axes over 'mp'.

    - 2D (in, out) dense kernels with out >= threshold -> P(None, 'mp')
    - 1D vectors (biases, BN scale/bias/stats) >= threshold -> P('mp')
    - everything else replicated.
    """
    shape = getattr(leaf, "shape", ())
    if len(shape) == 2 and shape[-1] >= tp_threshold:
        return P(None, "mp")
    if len(shape) == 1 and shape[0] >= tp_threshold:
        return P("mp")
    return P()


def state_shardings(state, mesh: Mesh, tp_threshold: int = TP_THRESHOLD):
    """NamedSharding tree mirroring any TrainState-like pytree."""
    return jax.tree_util.tree_map(
        lambda leaf: NamedSharding(mesh, leaf_pspec(leaf, tp_threshold)), state
    )


def batch_sharding(mesh: Mesh):
    """Batch arrays are sharded over 'dp' on the leading axis."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())
