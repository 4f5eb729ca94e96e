"""Cross-view center-consistency supervision (framework addition, no
reference analogue): off-by-default compatibility, canonical/world frame
semantics, loss arithmetic, and config plumbing.

Motivation: docs/RESULTS.md "per-view center identifiability" — the two
views' s2-center errors carry a large common-mode component the relative
task cancels; the DIFFERENTIAL component is the binding noise. The term
(losses.py ``center_consistency_weight``) penalizes only the latter.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alignnet3d_tpu.models.alignnet import AlignNet, ModelSpec
from alignnet3d_tpu.models.losses import LossSpec, get_loss
from alignnet3d_tpu.ops.transforms import rotate_points_z

B, N = 4, 64

SPEC = ModelSpec(
    num_points=N,
    num_bins=8,
    s1_backbone=(16, 32),
    s1_mlp=(32,),
    s2_backbone=(16, 32),
    s2_mlp=(32,),
    embedding=(16, 64),
    remaining_mlp=(32,),
)


def _out_and_labels(seed=5):
    model = AlignNet(SPEC)
    rng = np.random.default_rng(seed)
    pcs1 = jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32)
    pcs2 = jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        pcs1, pcs2, train=False,
    )
    out = dict(model.apply(variables, pcs1, pcs2, train=False))
    c1 = jnp.asarray(rng.normal(size=(B, 3)), jnp.float32)
    c2 = jnp.asarray(rng.normal(size=(B, 3)), jnp.float32)
    a1 = jnp.asarray(rng.uniform(-np.pi, np.pi, size=(B,)), jnp.float32)
    a2 = jnp.asarray(rng.uniform(-np.pi, np.pi, size=(B,)), jnp.float32)
    t = c2 - c1
    rel = (a2 - a1).reshape(B, 1)
    return pcs1, pcs2, out, t, rel, c1, c2, a1, a2


def _loss(out, labels, spec):
    pcs1, pcs2, t, rel, c1, c2, a1, a2 = labels
    return get_loss(pcs1, pcs2, t, rel, c1, c2,
                    a1.reshape(B, 1), a2.reshape(B, 1), out, spec=spec)


def test_off_by_default_and_arithmetic():
    pcs1, pcs2, out, t, rel, c1, c2, a1, a2 = _out_and_labels()
    labels = (pcs1, pcs2, t, rel, c1, c2, a1, a2)

    base = LossSpec(num_bins=8, accept_inverted_angle=True)
    loss_0, aux0 = _loss(out, labels, base)
    assert "losses_stages/center_consistency_loss" not in aux0

    spec = dataclasses.replace(base, center_consistency_weight=0.7)
    loss_w, aux = _loss(out, labels, spec)
    cons = float(aux["losses_stages/center_consistency_loss"])
    assert cons > 0
    np.testing.assert_allclose(
        float(loss_w), float(loss_0) + 0.7 * cons / B, rtol=1e-5
    )


def test_canonical_frame_ignores_common_mode_error():
    """A shared canonical-frame bias delta (pred_c_i = c_i + Rz-conv(a_i)
    applied to delta) is invisible to the canonical term but visible to
    the world term — the term targets only the differential component."""
    pcs1, pcs2, out, t, rel, c1, c2, a1, a2 = _out_and_labels()
    rng = np.random.default_rng(9)
    delta = jnp.asarray(rng.normal(size=(B, 3)), jnp.float32)
    # inverse of the canonicalization e_canon = rotate_points_z(e, -a):
    # rotate_points_z(rotate_points_z(x, a), -a) == x
    out = dict(out)
    out["pred_s2_pc1centers"] = c1 + rotate_points_z(delta[:, None, :], a1)[:, 0]
    out["pred_s2_pc2centers"] = c2 + rotate_points_z(delta[:, None, :], a2)[:, 0]
    labels = (pcs1, pcs2, t, rel, c1, c2, a1, a2)

    canon = LossSpec(num_bins=8, center_consistency_weight=1.0)
    _, aux = _loss(out, labels, canon)
    assert float(aux["losses_stages/center_consistency_loss"]) < 1e-9

    world = dataclasses.replace(canon, center_consistency_frame="world")
    _, aux_w = _loss(out, labels, world)
    assert float(aux_w["losses_stages/center_consistency_loss"]) > 1e-4


def test_world_frame_ignores_equal_world_errors():
    """Equal world-frame errors (center-DIFFERENCE exactly right) zero the
    world term; the canonical term still sees them when a1 != a2."""
    pcs1, pcs2, out, t, rel, c1, c2, a1, a2 = _out_and_labels(seed=11)
    rng = np.random.default_rng(13)
    e = jnp.asarray(rng.normal(size=(B, 3)), jnp.float32)
    out = dict(out)
    out["pred_s2_pc1centers"] = c1 + e
    out["pred_s2_pc2centers"] = c2 + e
    labels = (pcs1, pcs2, t, rel, c1, c2, a1, a2)

    world = LossSpec(num_bins=8, center_consistency_weight=1.0,
                     center_consistency_frame="world")
    _, aux_w = _loss(out, labels, world)
    assert float(aux_w["losses_stages/center_consistency_loss"]) < 1e-9

    canon = dataclasses.replace(world, center_consistency_frame="canonical")
    _, aux_c = _loss(out, labels, canon)
    assert float(aux_c["losses_stages/center_consistency_loss"]) > 1e-4


def test_invalid_frame_rejected():
    with pytest.raises(ValueError, match="center_consistency_frame"):
        LossSpec(num_bins=8, center_consistency_frame="object")


def test_config_plumbing():
    from alignnet3d_tpu.config import config_from_dict

    cfg = config_from_dict({
        "model": {"options": {"angle_factor": 1.0, "early_stage_factor": 0.5},
                  "angles": {"num_bins": 8, "accept_inverted_angle": True}},
        "training": {"loss": {"loss": "separate", "options": {
            "soft_angle_classes": False,
            "soft_angle_classes_sigma_in_degree": 5.0,
            "center_consistency_weight": 0.25,
            "center_consistency_frame": "world",
        }}},
    })
    spec = LossSpec.from_config(cfg)
    assert spec.center_consistency_weight == 0.25
    assert spec.center_consistency_frame == "world"
