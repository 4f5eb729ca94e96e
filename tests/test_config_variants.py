"""CLI e2e for remaining config variants: p2p loss, momentum optimizer,
soft angle classes."""

import json

import numpy as np
import pytest

from alignnet3d_tpu.data.synthetic import generate_dataset


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("variants")
    base = str(root / "DS")
    generate_dataset(base, num_train=8, num_val=4, seed=81, vres=12,
                     hres=120)
    return root, base


def _cfg(root, base, name, **training_overrides):
    cfg = {
        "data": {"basepath": base},
        "logging": {"basedir": str(root / "runs")},
        "model": {
            "num_points": 32, "backbone": "pointnet",
            "options": {
                "angle_factor": 1.0, "early_stage_factor": 0.5,
                "s1transformer": [[8, 16], [[16], 0.7]],
                "s2transformer": [[8, 16], [[16], 0.7]],
                "embedding": [8, 32],
                "remaining_transform_prediction": [[16], 0.7],
            },
            "angles": {"num_bins": 4, "accept_inverted_angle": True},
        },
        "training": {
            "batch_size": 4, "num_epochs": 1, "learning_rate": 1e-3,
            **training_overrides,
        },
        "evaluation": {"save_every_epoch": True},
    }
    path = str(root / f"{name}.json")
    json.dump(cfg, open(path, "w"))
    return path


def _run_and_check(root, name, cfg_path):
    from alignnet3d_tpu.cli import main

    main(["train", "--config", cfg_path])
    eval_dir = root / "runs" / name / "val" / "eval000000"
    ev = json.load(open(eval_dir / "eval.json"))
    assert ev["num"] == 4
    preds = np.load(eval_dir / "pred_translations.npy")
    assert np.all(np.isfinite(preds))


@pytest.mark.slow
def test_p2p_loss_end_to_end(dataset):
    root, base = dataset
    cfg_path = _cfg(root, base, "P2P", loss={"loss": "p2p"})
    _run_and_check(root, "P2P", cfg_path)


@pytest.mark.slow
def test_momentum_optimizer_end_to_end(dataset):
    root, base = dataset
    cfg_path = _cfg(root, base, "Mom",
                    optimizer={"optimizer": "momentum", "momentum": 0.9})
    _run_and_check(root, "Mom", cfg_path)


@pytest.mark.slow
def test_soft_angle_classes_end_to_end(dataset):
    root, base = dataset
    cfg_path = _cfg(root, base, "Soft", loss={
        "loss": "separate",
        "options": {"soft_angle_classes": True,
                    "soft_angle_classes_sigma_in_degree": 5.0},
    })
    _run_and_check(root, "Soft", cfg_path)
