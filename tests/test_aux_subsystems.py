"""Aux subsystems: profiler hook, NaN guard, host sharding."""

import json

import numpy as np
import pytest

from alignnet3d_tpu.data.provider import PackedDataset
from alignnet3d_tpu.data.synthetic import generate_dataset


def test_shard_indices_partition():
    idxs = list(range(10))
    shards = [PackedDataset.shard_indices(idxs, k, 3) for k in range(3)]
    assert sorted(sum(shards, [])) == idxs
    assert shards[0] == [0, 3, 6, 9]
    assert all(not set(a) & set(b) for a in shards for b in shards if a is not b)


@pytest.mark.slow
def test_nan_guard_aborts(tmp_path):
    base = str(tmp_path / "NaN")
    generate_dataset(base, num_train=8, num_val=4, seed=51, vres=12, hres=90)
    cfg_d = {
        "data": {"basepath": base},
        "logging": {"basedir": str(tmp_path / "runs")},
        "model": {
            "num_points": 32, "backbone": "pointnet",
            "options": {
                "angle_factor": 1.0, "early_stage_factor": 0.5,
                "s1transformer": [[8, 16], [[16], 0.7]],
                "s2transformer": [[8, 16], [[16], 0.7]],
                "embedding": [8, 32],
                "remaining_transform_prediction": [[16], 0.7],
            },
            "angles": {"num_bins": 4, "accept_inverted_angle": False},
        },
        # absurd LR to force divergence fast
        "training": {"batch_size": 8, "num_epochs": 50,
                     "learning_rate": 1e10},
        "evaluation": {"save_every_epoch": False},
    }
    cfg_path = str(tmp_path / "NaN.json")
    json.dump(cfg_d, open(cfg_path, "w"))
    from alignnet3d_tpu.config import load_config
    from alignnet3d_tpu.training import Trainer

    cfg = load_config(cfg_path)
    trainer = Trainer(cfg, seed=0)
    with pytest.raises(FloatingPointError, match="non-finite loss"):
        trainer.train()


@pytest.mark.slow
def test_profiler_hook(tmp_path):
    base = str(tmp_path / "Prof")
    generate_dataset(base, num_train=16, num_val=4, seed=61, vres=12,
                     hres=90)
    cfg_d = {
        "data": {"basepath": base},
        "logging": {"basedir": str(tmp_path / "runs")},
        "model": {
            "num_points": 32, "backbone": "pointnet",
            "options": {
                "angle_factor": 1.0, "early_stage_factor": 0.5,
                "s1transformer": [[8, 16], [[16], 0.7]],
                "s2transformer": [[8, 16], [[16], 0.7]],
                "embedding": [8, 32],
                "remaining_transform_prediction": [[16], 0.7],
            },
            "angles": {"num_bins": 4, "accept_inverted_angle": False},
        },
        "training": {"batch_size": 8, "num_epochs": 1,
                     "learning_rate": 1e-3},
        "evaluation": {"save_every_epoch": False},
        "tpu": {"profile": {"dir": str(tmp_path / "trace"), "steps": 1}},
    }
    cfg_path = str(tmp_path / "Prof.json")
    json.dump(cfg_d, open(cfg_path, "w"))
    from alignnet3d_tpu.config import load_config
    from alignnet3d_tpu.training import Trainer

    cfg = load_config(cfg_path)
    Trainer(cfg, seed=0).train()
    import os

    trace_root = tmp_path / "trace"
    assert trace_root.is_dir()
    found = any(
        f.endswith((".pb", ".json.gz", ".trace.json.gz", ".xplane.pb"))
        for _, _, files in os.walk(trace_root) for f in files
    )
    assert found, list(os.walk(trace_root))


def test_tqdm_progress_logs_final_stats(tmp_path, caplog):
    """reference train.py:114-126: the bar's final stats land in the log."""
    import logging as _logging

    from alignnet3d_tpu.training.trainer import progress, setup_logging

    setup_logging(str(tmp_path))
    with caplog.at_level(_logging.DEBUG, logger="alignnet3d_tpu"):
        bar = progress(range(7), desc="unit", total=7)
        for _ in bar:
            pass
        bar.close()
    msgs = [r.message for r in caplog.records if "progress" in r.message]
    assert msgs and "7/7" in msgs[-1]
