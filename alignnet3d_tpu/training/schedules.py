"""Learning-rate and BN-momentum schedules.

Reference semantics (train.py:133-174): staircase exponential decay driven
by ``step * batch_size`` with the decay interval optionally scaled to
epochs, LR floored at 1e-5, and BN momentum
``min(clip, 1 - init * rate^k)`` rising from 0.5 toward ``clip``.

Implemented as pure jnp functions of the step counter so they trace into
the jitted train step (no host round-trip per step).
"""

from __future__ import annotations

import jax.numpy as jnp


def _decay_interval(ext, batch_size: int, num_batches_per_epoch: int) -> float:
    step = ext.step
    if ext.per == "epoch":
        step = step * batch_size * num_batches_per_epoch
    elif ext.per != "step":
        raise ValueError(f"unknown schedule per={ext.per!r}")
    return float(step)


def learning_rate(step, cfg, num_batches_per_epoch: int):
    """Staircase exp decay with 1e-5 floor (reference train.py:133-156)."""
    ext = cfg.training.lr_extension
    assert ext.mode == "decay", f"unsupported lr mode {ext.mode!r}"
    interval = _decay_interval(ext, cfg.training.batch_size, num_batches_per_epoch)
    k = jnp.floor(
        step.astype(jnp.float32) * cfg.training.batch_size / interval
    )
    lr = cfg.training.learning_rate * jnp.power(ext.rate, k)
    return jnp.maximum(lr, 1e-5)


def bn_decay(step, cfg, num_batches_per_epoch: int):
    """EMA momentum schedule (reference train.py:159-174):
    ``min(clip, 1 - init * rate^k)``."""
    ext = cfg.training.bn_extension
    assert ext.mode == "decay"
    interval = _decay_interval(ext, cfg.training.batch_size, num_batches_per_epoch)
    k = jnp.floor(
        step.astype(jnp.float32) * cfg.training.batch_size / interval
    )
    bn_momentum = ext.init * jnp.power(ext.rate, k)
    return jnp.minimum(ext.clip, 1.0 - bn_momentum)
