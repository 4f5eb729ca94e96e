"""Numerical equivalence of the sharded training step: running the SAME
step under a (dp=2, mp=2) mesh must produce the same loss and parameters
as the single-device execution — the partition rules only change layout,
never math (XLA inserts the collectives)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from alignnet3d_tpu.models.alignnet import AlignNet, ModelSpec
from alignnet3d_tpu.models.losses import LossSpec, get_loss
from alignnet3d_tpu.parallel import mesh as meshlib

SPEC = ModelSpec(
    num_points=64, num_bins=8,
    s1_backbone=(16, 32), s1_mlp=(32,),
    s2_backbone=(16, 512), s2_mlp=(32,),   # 512-wide: exercises mp sharding
    embedding=(16, 1024), remaining_mlp=(32,),
)
LOSS = LossSpec(num_bins=8)


def _setup():
    model = AlignNet(SPEC)
    rng = np.random.default_rng(0)
    B = 8
    pcs1 = jnp.asarray(rng.normal(size=(B, 64, 3)), jnp.float32)
    pcs2 = jnp.asarray(rng.normal(size=(B, 64, 3)), jnp.float32)
    labels = (
        jnp.asarray(rng.normal(size=(B, 3)), jnp.float32),
        jnp.asarray(rng.uniform(-1, 1, (B, 1)), jnp.float32),
        jnp.asarray(rng.normal(size=(B, 3)), jnp.float32),
        jnp.asarray(rng.normal(size=(B, 3)), jnp.float32),
        jnp.asarray(rng.uniform(-1, 1, (B, 1)), jnp.float32),
        jnp.asarray(rng.uniform(-1, 1, (B, 1)), jnp.float32),
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        pcs1, pcs2, train=False,
    )
    tx = optax.sgd(1e-2)  # linear in grads: reduction-order noise stays tiny
    # (adam rsqrt amplifies bit-level differences on the first step)
    state = {
        "params": variables["params"],
        "batch_stats": variables["batch_stats"],
        "opt_state": tx.init(variables["params"]),
    }

    def train_step(state, pcs1, pcs2, labels):
        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state["batch_stats"]},
                pcs1, pcs2, train=True, momentum=0.9,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(7)},
            )
            loss, _ = get_loss(pcs1, pcs2, *labels, out, spec=LOSS)
            return loss, mutated["batch_stats"]

        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["params"]
        )
        ups, opt = tx.update(grads, state["opt_state"], state["params"])
        params = optax.apply_updates(state["params"], ups)
        return {"params": params, "batch_stats": stats, "opt_state": opt}, loss

    return model, state, train_step, (pcs1, pcs2, labels)


@pytest.mark.slow
def test_sharded_step_matches_single_device():
    model, state, train_step, (pcs1, pcs2, labels) = _setup()

    # single-device reference
    ref_state, ref_loss = jax.jit(train_step)(state, pcs1, pcs2, labels)
    ref_loss = float(ref_loss)
    ref_params = jax.device_get(ref_state["params"])

    # sharded execution on a 2x2 mesh
    mesh = meshlib.make_mesh(dp=2, mp=2)
    st_shard = meshlib.state_shardings(state, mesh)
    b_shard = meshlib.batch_sharding(mesh)
    rep = meshlib.replicated(mesh)
    sharded = jax.jit(
        train_step,
        in_shardings=(st_shard, b_shard, b_shard, (b_shard,) * 6),
        out_shardings=(st_shard, rep),
    )
    state_sh = jax.device_put(state, st_shard)
    out_state, loss = sharded(state_sh, pcs1, pcs2, labels)
    assert float(loss) == pytest.approx(ref_loss, rel=1e-5)

    got = jax.device_get(out_state["params"])
    flat_ref = jax.tree_util.tree_leaves_with_path(ref_params)
    flat_got = {tuple(str(k) for k in p): v
                for p, v in jax.tree_util.tree_leaves_with_path(got)}
    for path, ref_leaf in flat_ref:
        key = tuple(str(k) for k in path)
        np.testing.assert_allclose(
            flat_got[key], ref_leaf, rtol=2e-4, atol=2e-5,
            err_msg=str(key),
        )
    # and the wide kernels really are sharded over mp
    wide = out_state["params"]["siamese"]["PointNetBackbone_0"]["conv2"][
        "kernel"
    ]
    assert "mp" in str(wide.sharding.spec)
