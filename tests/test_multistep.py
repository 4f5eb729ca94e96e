"""tpu.steps_per_dispatch: K optimizer steps per device dispatch.

The multi-step path (trainer._train_multi_step_fn, a lax.scan over
stacked batches inside ONE jit) must reproduce the single-step loop's
semantics exactly: same shuffled batch order (epoch rng is derived from
(seed, epoch), not from K), same dropout/jitter key stream, same
per-step schedule values (state.step advances inside the scan), same
number of scalar rows. Equality is checked end-to-end: one epoch at
K=1 vs K=4 (even split) vs K=3 (remainder chunk) from identical inits.
"""

import json
import os

import jax
import numpy as np
import pytest

from alignnet3d_tpu.config import load_config
from alignnet3d_tpu.data.synthetic import generate_dataset
from alignnet3d_tpu.training.trainer import ScalarWriter, Trainer


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("multistep")
    base = str(root / "SynthMS")
    generate_dataset(base, num_train=32, num_val=8, seed=13, vres=16,
                     hres=180)
    return root, base


def _cfg(root, base, k):
    d = {
        "data": {"basepath": base},
        "logging": {"basedir": str(root / f"runs{k}")},
        "model": {
            "num_points": 64, "backbone": "pointnet",
            "options": {
                "angle_factor": 1.0, "early_stage_factor": 0.5,
                "s1transformer": [[16, 32], [[32], 0.7]],
                "s2transformer": [[16, 32], [[32], 0.7]],
                "embedding": [16, 64],
                "remaining_transform_prediction": [[32], 0.7],
            },
            "angles": {"num_bins": 8, "accept_inverted_angle": True},
        },
        # momentum (plain SGD) keeps the equality check meaningful: the
        # scan-compiled and step-compiled XLA programs differ in fusion
        # order at the ~1e-6 gradient level, which Adam's sqrt(v)
        # normalization amplifies into sign flips on near-zero gradients
        # — a property of the optimizer, not of the dispatch path
        "training": {"batch_size": 8, "num_epochs": 1,
                     "learning_rate": 0.005,
                     "optimizer": {"optimizer": "momentum",
                                   "momentum": 0.9}},
        "evaluation": {"save_every_epoch": True},
    }
    if k > 1:
        d["tpu"] = {"steps_per_dispatch": k}
    path = str(root / f"MS{k}.json")
    with open(path, "w") as f:
        json.dump(d, f)
    return load_config(path)


def _one_epoch(root, base, k):
    cfg = _cfg(root, base, k)
    os.makedirs(cfg.logging.logdir, exist_ok=True)
    trainer = Trainer(cfg, seed=7)
    state = trainer.init_state()
    state = trainer._place_state(state)
    writer = ScalarWriter(os.path.join(cfg.logging.logdir, "scalars.jsonl"))
    state = trainer.train_one_epoch(state, 0, writer)
    params = jax.device_get(state.params)
    return (int(jax.device_get(state.step)), params,
            os.path.join(cfg.logging.logdir, "scalars.jsonl"))


@pytest.mark.slow
def test_multi_step_matches_single_step(workspace):
    root, base = workspace
    step1, p1, rows1 = _one_epoch(root, base, 1)
    step4, p4, rows4 = _one_epoch(root, base, 4)   # 4 steps = 1 dispatch
    step3, p3, rows3 = _one_epoch(root, base, 3)   # 3 + 1 remainder chunk

    assert step1 == step4 == step3 == 4  # 32 samples / batch 8

    flat1 = jax.tree_util.tree_leaves(p1)
    for pk, tag in ((p4, "K=4"), (p3, "K=3")):
        for a, b in zip(flat1, jax.tree_util.tree_leaves(pk)):
            np.testing.assert_allclose(
                a, b, rtol=1e-3, atol=1e-5,
                err_msg=f"{tag} params diverge from K=1",
            )

    # one scalar row per optimizer step either way, with matching steps
    r1 = [json.loads(x) for x in open(rows1)]
    r4 = [json.loads(x) for x in open(rows4)]
    assert [r["step"] for r in r1] == [r["step"] for r in r4] == [1, 2, 3, 4]
    l1 = np.array([r["losses/loss"] for r in r1])
    l4 = np.array([r["losses/loss"] for r in r4])
    np.testing.assert_allclose(l1, l4, rtol=1e-4, atol=1e-5)
    # schedules advanced per-step inside the scan, not per-dispatch
    lr1 = [r["hyperparameters/learning_rate"] for r in r1]
    lr4 = [r["hyperparameters/learning_rate"] for r in r4]
    np.testing.assert_allclose(lr1, lr4, rtol=0, atol=0)
