"""Per-view canonical shape-completion prior (framework addition, no
reference analogue): model head shapes, chamfer-loss semantics (flip
invariance, zero at exact completion), config plumbing, and an e2e
training smoke.

Motivation: docs/RESULTS.md "per-view center identifiability" — the
fine-bucket floor is each view's shape understanding, so the embedding
is given an auxiliary canonical-completion task (alignnet.py
``completion_points``, losses.py ``_completion_loss``).
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alignnet3d_tpu.models.alignnet import AlignNet, ModelSpec
from alignnet3d_tpu.models.losses import (
    LossSpec,
    _completion_loss,
    _sq_chamfer,
    get_loss,
)
from alignnet3d_tpu.ops.transforms import rotate_points_z

B, N, M = 4, 64, 16

SPEC = ModelSpec(
    num_points=N,
    num_bins=8,
    s1_backbone=(16, 32),
    s1_mlp=(32,),
    s2_backbone=(16, 32),
    s2_mlp=(32,),
    embedding=(16, 64),
    remaining_mlp=(32,),
    completion_points=M,
)


def _init(spec):
    model = AlignNet(spec)
    pcs = jnp.zeros((B, N, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        pcs, pcs, train=False,
    )
    return model, variables


def _batch(seed=0):
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32),
        jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32),
    )


def test_completion_head_shapes_and_default_off():
    model, variables = _init(SPEC)
    pcs1, pcs2 = _batch()
    out = model.apply(variables, pcs1, pcs2, train=False)
    assert out["pred_pc1completions"].shape == (B, M, 3)
    assert out["pred_pc2completions"].shape == (B, M, 3)
    assert np.all(np.isfinite(np.asarray(out["pred_pc1completions"])))

    # default spec (completion_points=0) emits no completion keys — the
    # param tree and end_points schema of existing configs are unchanged
    import dataclasses

    off = dataclasses.replace(SPEC, completion_points=0)
    model0, variables0 = _init(off)
    out0 = model0.apply(variables0, pcs1, pcs2, train=False)
    assert "pred_pc1completions" not in out0
    assert "completion" not in variables0["params"]["siamese"]


def test_sq_chamfer_zero_and_symmetry():
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.normal(size=(B, M, 3)), jnp.float32)
    np.testing.assert_allclose(np.asarray(_sq_chamfer(a, a)), 0.0, atol=1e-5)
    b = jnp.asarray(rng.normal(size=(B, 2 * M, 3)), jnp.float32)
    d_ab = np.asarray(_sq_chamfer(a, b))
    assert d_ab.shape == (B,) and np.all(d_ab > 0)


def _labels(seed=5):
    rng = np.random.default_rng(seed)
    c1 = jnp.asarray(rng.normal(size=(B, 3)), jnp.float32)
    c2 = jnp.asarray(rng.normal(size=(B, 3)), jnp.float32)
    a1 = jnp.asarray(rng.uniform(-np.pi, np.pi, size=(B,)), jnp.float32)
    a2 = jnp.asarray(rng.uniform(-np.pi, np.pi, size=(B,)), jnp.float32)
    return c1, c2, a1, a2


def test_completion_loss_flip_invariance():
    """A completion that is 180-degree flipped scores identically — the
    per-view min over {target, flipped target} makes the supervision
    compatible with accept_inverted_angle canonicalization."""
    pcs1, pcs2 = _batch()
    c1, c2, a1, a2 = _labels()
    rng = np.random.default_rng(7)
    comp = jnp.asarray(rng.normal(size=(B, M, 3)), jnp.float32)
    flip = comp * jnp.asarray([-1.0, -1.0, 1.0])

    ep = {"pred_pc1completions": comp, "pred_pc2completions": comp}
    ep_f = {"pred_pc1completions": flip, "pred_pc2completions": flip}
    l0 = float(_completion_loss(pcs1, pcs2, c1, c2, a1, a2, ep))
    l1 = float(_completion_loss(pcs1, pcs2, c1, c2, a1, a2, ep_f))
    np.testing.assert_allclose(l0, l1, rtol=1e-5)


def test_completion_loss_zero_at_exact_union():
    """Predicting exactly the GT canonical union gives (near-)zero loss:
    the target construction matches the model's canonicalization
    convention Rz(-a)(p - c)."""
    rng = np.random.default_rng(11)
    half = N // 2
    pcs1 = jnp.asarray(rng.normal(size=(B, half, 3)), jnp.float32)
    pcs2 = jnp.asarray(rng.normal(size=(B, half, 3)), jnp.float32)
    c1, c2, a1, a2 = _labels()
    u1 = rotate_points_z(pcs1 - c1[:, None, :], -a1)
    u2 = rotate_points_z(pcs2 - c2[:, None, :], -a2)
    union = jnp.concatenate([u1, u2], axis=1)  # (B, N, 3)
    ep = {"pred_pc1completions": union, "pred_pc2completions": union}
    # the expanded ||p||^2 - 2 p.u + ||u||^2 form cancels catastrophically
    # in f32; "zero" here means sub-millimeter-squared
    loss = float(_completion_loss(pcs1, pcs2, c1, c2, a1, a2, ep))
    assert loss < 1e-5


def test_loss_separate_with_completion_and_guard():
    model, variables = _init(SPEC)
    pcs1, pcs2 = _batch()
    c1, c2, a1, a2 = _labels()
    t = jnp.zeros((B, 3))
    rel = (a2 - a1).reshape(B, 1)
    out = model.apply(variables, pcs1, pcs2, train=False)

    spec = LossSpec(num_bins=8, accept_inverted_angle=True,
                    completion_weight=0.5)
    loss_w, aux = get_loss(pcs1, pcs2, t, rel, c1, c2,
                           a1.reshape(B, 1), a2.reshape(B, 1), out, spec=spec)
    assert "losses_stages/completion_loss" in aux
    comp = float(aux["losses_stages/completion_loss"])
    assert comp > 0

    base = LossSpec(num_bins=8, accept_inverted_angle=True)
    loss_0, aux0 = get_loss(pcs1, pcs2, t, rel, c1, c2,
                            a1.reshape(B, 1), a2.reshape(B, 1), out, spec=base)
    assert "losses_stages/completion_loss" not in aux0
    np.testing.assert_allclose(
        float(loss_w), float(loss_0) + 0.5 * comp / B, rtol=1e-5
    )

    # weight > 0 without the model head is a config error, not silence
    out_nohead = {k: v for k, v in out.items() if "completions" not in k}
    with pytest.raises(ValueError, match="completion_points"):
        get_loss(pcs1, pcs2, t, rel, c1, c2,
                 a1.reshape(B, 1), a2.reshape(B, 1), out_nohead, spec=spec)


def test_completion_gradient_reaches_s2_center():
    """The completion term must backpropagate into the stage-2 center
    branch (the whole point: a shape-consistency pull on the predicted
    canonical frame)."""
    model, variables = _init(SPEC)
    pcs1, pcs2 = _batch()
    c1, c2, a1, a2 = _labels()

    def comp_only(params):
        out = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            pcs1, pcs2, train=False,
        )
        return _completion_loss(pcs1, pcs2, c1, c2, a1, a2, out)

    grads = jax.grad(comp_only)(variables["params"])
    g = grads["siamese"]["transformer2"]
    leaf_norms = [float(jnp.linalg.norm(x)) for x in jax.tree_util.tree_leaves(g)]
    assert max(leaf_norms) > 0.0


@pytest.mark.slow
def test_completion_end_to_end_training(tmp_path):
    from alignnet3d_tpu.data.synthetic import generate_dataset

    base = str(tmp_path / "Comp")
    generate_dataset(base, num_train=8, num_val=4, seed=43, vres=12, hres=120)
    cfg = {
        "data": {"basepath": base},
        "logging": {"basedir": str(tmp_path / "runs")},
        "model": {
            "num_points": 48, "backbone": "pointnet",
            "options": {
                "angle_factor": 1.0, "early_stage_factor": 0.5,
                "s1transformer": [[16, 32], [[32], 0.7]],
                "s2transformer": [[16, 32], [[32], 0.7]],
                "embedding": [16, 64],
                "remaining_transform_prediction": [[32], 0.7],
                "completion_points": 16,
            },
            "angles": {"num_bins": 8, "accept_inverted_angle": True},
        },
        "training": {
            "batch_size": 4, "num_epochs": 1, "learning_rate": 0.005,
            "loss": {"loss": "separate",
                     "options": {"completion_weight": 1.0}},
        },
        "evaluation": {"save_every_epoch": True},
    }
    cfg_path = str(tmp_path / "Comp.json")
    json.dump(cfg, open(cfg_path, "w"))
    from alignnet3d_tpu.cli import main

    main(["train", "--config", cfg_path])
    eval_dir = tmp_path / "runs" / "Comp" / "val" / "eval000000"
    ev = json.load(open(eval_dir / "eval.json"))
    assert ev["num"] == 4
    preds = np.load(eval_dir / "pred_translations.npy")
    assert np.all(np.isfinite(preds))


def test_serving_fold_ignores_completion_head():
    """The BN-folded serving path (serving.py) must serve a
    completion-trained checkpoint unchanged: the aux head is
    training-only and its params are simply not part of the fold."""
    import jax.numpy as jnp

    from alignnet3d_tpu.serving import build_inference_fn

    model, variables = _init(SPEC)
    fn = build_inference_fn(SPEC, variables, compute_dtype=jnp.float32)
    pcs1, pcs2 = _batch(seed=9)
    out_s = fn(pcs1, pcs2)
    out_m = model.apply(variables, pcs1, pcs2, train=False)
    for key in ("pred_translations", "pred_s2_pc1centers",
                "pred_remaining_angle_logits"):
        np.testing.assert_allclose(
            np.asarray(out_s[key]), np.asarray(out_m[key]),
            rtol=1e-4, atol=1e-4,
        )
    assert "pred_pc1completions" not in out_s
