"""Schedules, sharding rules, and trainer mechanics (fast paths only — the
full CLI e2e lives in test_train_e2e.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from alignnet3d_tpu.config import config_from_dict
from alignnet3d_tpu.training import schedules


def _cfg(per="epoch", step=30, rate=0.5, lr=0.01, batch_size=64):
    return config_from_dict({
        "training": {
            "batch_size": batch_size,
            "learning_rate": lr,
            "lr_extension": {"mode": "decay", "per": per, "step": step,
                             "rate": rate},
            "bn_extension": {"mode": "decay", "per": per, "step": step,
                             "rate": rate, "init": 0.5, "clip": 0.99},
        }
    })


def test_lr_staircase_per_epoch():
    """lr = lr0 * rate^floor(step*bs / (decay_epochs*bs*nbpe)), floored at
    1e-5 (reference train.py:133-156)."""
    cfg = _cfg()
    nbpe = 100  # batches per epoch
    # within the first 30 epochs: no decay
    assert float(schedules.learning_rate(jnp.asarray(0), cfg, nbpe)) == pytest.approx(0.01)
    assert float(
        schedules.learning_rate(jnp.asarray(30 * nbpe - 1), cfg, nbpe)
    ) == pytest.approx(0.01)
    # epoch 30 -> one decay
    assert float(
        schedules.learning_rate(jnp.asarray(30 * nbpe), cfg, nbpe)
    ) == pytest.approx(0.005)
    # epoch 60 -> two decays
    assert float(
        schedules.learning_rate(jnp.asarray(60 * nbpe), cfg, nbpe)
    ) == pytest.approx(0.0025)
    # very late -> clipped at 1e-5
    assert float(
        schedules.learning_rate(jnp.asarray(10000 * nbpe), cfg, nbpe)
    ) == pytest.approx(1e-5)


def test_lr_staircase_per_step():
    cfg = _cfg(per="step", step=1000)
    # decay interval is 1000 raw samples: step*bs/1000
    assert float(schedules.learning_rate(jnp.asarray(0), cfg, 1)) == pytest.approx(0.01)
    # step 16: 16*64=1024 samples -> one decay
    assert float(schedules.learning_rate(jnp.asarray(16), cfg, 1)) == pytest.approx(0.005)


def test_bn_decay_schedule():
    """momentum = min(0.99, 1 - 0.5 * 0.5^epochs/30) (train.py:159-174)."""
    cfg = _cfg()
    nbpe = 100
    assert float(schedules.bn_decay(jnp.asarray(0), cfg, nbpe)) == pytest.approx(0.5)
    assert float(
        schedules.bn_decay(jnp.asarray(30 * nbpe), cfg, nbpe)
    ) == pytest.approx(0.75)
    assert float(
        schedules.bn_decay(jnp.asarray(60 * nbpe), cfg, nbpe)
    ) == pytest.approx(0.875)
    assert float(
        schedules.bn_decay(jnp.asarray(1000 * nbpe), cfg, nbpe)
    ) == pytest.approx(0.99)


def test_partition_rules():
    from jax.sharding import PartitionSpec as P

    from alignnet3d_tpu.parallel.mesh import leaf_pspec

    assert leaf_pspec(np.zeros((128, 1024))) == P(None, "mp")
    assert leaf_pspec(np.zeros((1024, 256))) == P()  # narrow output
    assert leaf_pspec(np.zeros((1024,))) == P("mp")
    assert leaf_pspec(np.zeros((64,))) == P()
    assert leaf_pspec(np.zeros(())) == P()


def test_make_mesh_shapes():
    from alignnet3d_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(dp=-1, mp=2)
    assert mesh.shape["dp"] * mesh.shape["mp"] <= 8
    assert mesh.shape["mp"] == 2
    mesh1 = make_mesh(dp=4, mp=2)
    assert dict(mesh1.shape) == {"dp": 4, "mp": 2}
