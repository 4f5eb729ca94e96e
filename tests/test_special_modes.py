"""Special evaluation modes through the CLI: 'held' (velocity-only eval
with an external model) and 'timings' (reference train.py:548-561), plus a
dgcnn-backbone end-to-end smoke."""

import json
import os

import numpy as np
import pytest

from alignnet3d_tpu.data.synthetic import generate_dataset

MODEL_OPTS = {
    "num_points": 48, "backbone": "pointnet",
    "options": {
        "angle_factor": 1.0, "early_stage_factor": 0.5,
        "s1transformer": [[16, 32], [[32], 0.7]],
        "s2transformer": [[16, 32], [[32], 0.7]],
        "embedding": [16, 64],
        "remaining_transform_prediction": [[32], 0.7],
    },
    "angles": {"num_bins": 8, "accept_inverted_angle": True},
}


@pytest.fixture(scope="module")
def held_workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("held")
    base = str(root / "HeldData")
    generate_dataset(base, num_train=8, num_val=8, seed=31, vres=12,
                     hres=120)
    # augment metas with Held-style fields (timestamps, trackid, frames)
    for i in range(16):
        path = f"{base}/meta/{i:08d}.json"
        meta = json.load(open(path))
        meta.update({
            "trackid": i % 2,
            "frames": [i // 2, i // 2 + 1],
            "timestamps": [0.1 * (i // 2), 0.1 * (i // 2 + 1)],
        })
        json.dump(meta, open(path, "w"))

    # train a checkpoint the held mode can load
    train_cfg = {
        "data": {"basepath": base},
        "logging": {"basedir": str(root / "runs")},
        "model": dict(MODEL_OPTS),
        "training": {"batch_size": 8, "num_epochs": 1,
                     "learning_rate": 0.005},
        "evaluation": {"save_every_epoch": True},
    }
    cfg_path = str(root / "HeldTrain.json")
    json.dump(train_cfg, open(cfg_path, "w"))
    from alignnet3d_tpu.cli import main

    main(["train", "--config", cfg_path])
    return root, base


def test_held_mode(held_workspace):
    root, base = held_workspace
    held_cfg = {
        "data": {"basepath": base},
        "logging": {"basedir": str(root / "runs")},
        "model": dict(MODEL_OPTS),
        "training": {"batch_size": 8, "num_epochs": 1},
        "evaluation": {
            "save_every_epoch": True,
            "special": {
                "mode": "held",
                "held": {"model": str(root / "runs" / "HeldTrain")},
            },
        },
    }
    cfg_path = str(root / "Held.json")
    json.dump(held_cfg, open(cfg_path, "w"))
    from alignnet3d_tpu.cli import main

    main(["eval_only", "--config", cfg_path, "--eval_epoch", "0"])
    eval_dir = root / "runs" / "Held" / "val" / "eval000000"
    tracks = [f for f in os.listdir(eval_dir) if f.startswith("track")]
    assert len(tracks) == 2  # two track ids
    vals = [float(x) for x in open(eval_dir / tracks[0])]
    assert all(np.isfinite(vals))


def test_timings_mode(held_workspace, capsys):
    root, base = held_workspace
    cfg = {
        "data": {"basepath": base},
        "logging": {"basedir": str(root / "runs")},
        "model": dict(MODEL_OPTS),
        "training": {"batch_size": 8, "num_epochs": 1},
        "evaluation": {
            "save_every_epoch": True,
            "special": {"mode": "timings"},
        },
    }
    cfg_path = str(root / "Timings.json")
    json.dump(cfg, open(cfg_path, "w"))
    from alignnet3d_tpu.cli import main

    main(["eval_only", "--config", cfg_path, "--eval_epoch", "0"])
    out = capsys.readouterr().out
    # 10 repeats at bs=32 (reference train.py:555-559)
    assert out.count("Timing bs=32:") == 10


@pytest.mark.slow
def test_dgcnn_backbone_end_to_end(tmp_path):
    base = str(tmp_path / "DG")
    generate_dataset(base, num_train=8, num_val=4, seed=41, vres=12,
                     hres=120)
    cfg = {
        "data": {"basepath": base},
        "logging": {"basedir": str(tmp_path / "runs")},
        "model": dict(MODEL_OPTS, backbone="dgcnn"),
        "training": {"batch_size": 4, "num_epochs": 1,
                     "learning_rate": 0.005},
        "evaluation": {"save_every_epoch": True},
    }
    cfg_path = str(tmp_path / "DG.json")
    json.dump(cfg, open(cfg_path, "w"))
    from alignnet3d_tpu.cli import main

    main(["train", "--config", cfg_path])
    eval_dir = tmp_path / "runs" / "DG" / "val" / "eval000000"
    ev = json.load(open(eval_dir / "eval.json"))
    assert ev["num"] == 4
    preds = np.load(eval_dir / "pred_translations.npy")
    assert np.all(np.isfinite(preds))
