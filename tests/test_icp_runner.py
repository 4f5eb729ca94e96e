"""Standalone ICP evaluation mode (evaluation.special.mode == 'icp')
through the CLI — the L7 path (reference icp.py:150-213)."""

import json
import os

import numpy as np
import pytest

from alignnet3d_tpu.data.synthetic import generate_dataset


@pytest.fixture(scope="module")
def icp_workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("icp")
    base = str(root / "SynthICP")
    # near-static pairs so centroid-init constrained ICP can align them:
    # low speed is not controllable directly, so use the default sampler
    # and just check the pipeline + artifacts (accuracy asserts are loose)
    generate_dataset(base, num_train=4, num_val=8, seed=21, vres=24,
                     hres=480)
    return root, base


def _make_cfg(root, base, variant, refine=None, name="icp_SynthICP_x"):
    icp = {"variant": variant, "with_constraint": True}
    if refine:
        icp["refine"] = refine
    cfg = {
        "data": {"basepath": base},
        "logging": {"basedir": str(root / "runs")},
        "evaluation": {"special": {"mode": "icp", "icp": icp}},
    }
    path = str(root / f"{name}.json")
    with open(path, "w") as f:
        json.dump(cfg, f)
    return path


@pytest.mark.slow
def test_p2point_standalone(icp_workspace):
    root, base = icp_workspace
    from alignnet3d_tpu.cli import main

    cfg_path = _make_cfg(root, base, "p2point", name="icp_SynthICP_o3_p2p")
    main(["train", "--config", cfg_path])
    eval_dir = root / "runs" / "icp_SynthICP" / "icp_SynthICP_o3_p2p" / \
        "val" / "eval000000"
    assert (eval_dir / "eval.json").is_file()
    assert (eval_dir / "eval_180.json").is_file()
    preds = np.load(eval_dir / "pred_translations.npy")
    assert preds.shape == (8, 3) and np.all(np.isfinite(preds))
    centers = np.load(eval_dir / "pred_s1_pc1centers.npy")
    assert np.all(centers == 0)  # world-frame convention (icp.py:196-198)
    ev = json.load(open(eval_dir / "eval.json"))
    assert ev["num"] == 8
    assert ev["mean_time"] > 0


def test_gicp_multistart_standalone(icp_workspace):
    root, base = icp_workspace
    from alignnet3d_tpu.cli import main

    cfg_path = _make_cfg(root, base, "o3_gicp_fast",
                         name="icp_SynthICP_o3_gicp_fast")
    main(["train", "--config", cfg_path])
    eval_dir = root / "runs" / "icp_SynthICP" / "icp_SynthICP_o3_gicp_fast" \
        / "val" / "eval000000"
    assert (eval_dir / "eval.json").is_file()


@pytest.mark.slow
def test_gicp_p2p_refine_reuses_base_outputs(icp_workspace):
    """The *_p2p variant must find the base run's outputs via the
    logdir[:-4] convention (reference icp.py:160-170)."""
    root, base = icp_workspace
    from alignnet3d_tpu.cli import main

    cfg_path = _make_cfg(root, base, "o3_gicp_fast", refine="p2p",
                         name="icp_SynthICP_o3_gicp_fast_p2p")
    main(["train", "--config", cfg_path])
    eval_dir = root / "runs" / "icp_SynthICP" / \
        "icp_SynthICP_o3_gicp_fast_p2p" / "val" / "eval000000"
    ev = json.load(open(eval_dir / "eval.json"))
    # mean_time must include the precomputed base run's budget
    base_ev = json.load(open(
        root / "runs" / "icp_SynthICP" / "icp_SynthICP_o3_gicp_fast" /
        "val" / "eval000000" / "eval_180.json"
    ))
    assert ev["mean_time"] >= base_ev["mean_time"]


def test_make_icp_configs_matrix(tmp_path):
    import make_icp_configs

    names = make_icp_configs.main(basedir=str(tmp_path), data_root="data")
    assert len(names) == 40
    sample = json.load(open(tmp_path / "icp_SynthCars_o3_gicp_p2p.json"))
    assert sample["evaluation"]["special"]["icp"]["refine"] == "p2p"
    assert sample["evaluation"]["special"]["icp"]["with_constraint"] is True
    assert sample["evaluation"]["special"]["mode"] == "icp"
