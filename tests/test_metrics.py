"""Metrics parity tests: the vectorized evaluate() against an independent
per-sample loop implementing the reference math (evaluation.py:128-211),
plus eval.json artifact behavior."""

import copy
import json
import os

import numpy as np
import pytest

from alignnet3d_tpu.config import config_from_dict
from alignnet3d_tpu.evaluation import metrics as M
from alignnet3d_tpu.geometry import (
    translate_transform_to_new_center_of_rotation,
)


def test_eval_translation_levels():
    d, lv = M.eval_translation(np.array([0.005, 0.0, 9.0]), np.zeros(3))
    assert d == pytest.approx(0.005)
    assert list(lv) == [1, 1, 1]  # z ignored (XY only)
    d, lv = M.eval_translation(np.array([0.05, 0.0, 0.0]), np.zeros(3))
    assert list(lv) == [0, 1, 1]
    d, lv = M.eval_translation(np.array([0.15, 0.0, 0.0]), np.zeros(3))
    assert list(lv) == [0, 0, 1]
    d, lv = M.eval_translation(np.array([0.5, 0.0, 0.0]), np.zeros(3))
    assert list(lv) == [0, 0, 0]


def test_eval_angle_levels_and_inversion():
    d, lv = M.eval_angle(0.0, np.deg2rad(0.5), accept_inverted_angle=False)
    assert d == pytest.approx(0.5)
    assert list(lv) == [1, 1, 1]
    d, lv = M.eval_angle(0.0, np.deg2rad(7.0), accept_inverted_angle=False)
    assert list(lv) == [0, 0, 1]
    # 180-degree flip accepted
    d, lv = M.eval_angle(0.0, np.pi + np.deg2rad(2.0), accept_inverted_angle=True)
    assert d == pytest.approx(2.0, abs=1e-6)
    assert list(lv) == [0, 1, 1]
    d, _ = M.eval_angle(0.0, np.pi, accept_inverted_angle=False)
    assert d == pytest.approx(180.0)


def test_eval_transform_elementwise_min():
    lv = M.eval_transform(
        np.array([0.05, 0, 0]), np.zeros(3), 0.0, np.deg2rad(0.5), False
    )
    assert list(lv) == [0, 1, 1]


def _reference_loop_eval(pred_t, pred_a, gt_t, gt_a, pred_c, gt_c,
                         accept_inverted, is_test):
    """Independent scalar-loop implementation of the reference accumulation
    (evaluation.py:133-211) used as the parity oracle."""
    new_t = translate_transform_to_new_center_of_rotation(
        pred_t, pred_a, pred_c, gt_c
    )
    empty = {
        "corr_levels_translation": np.zeros(3), "corr_levels_angles": np.zeros(3),
        "corr_levels": np.zeros(3), "mean_dist_translation": 0.0,
        "mean_sq_dist_translation": 0.0, "mean_dist_angle": 0.0,
        "mean_sq_dist_angle": 0.0, "num": 0,
    }
    measures = {
        s: {k: copy.deepcopy(empty) for k in ["all", "5m", "10m", "15m", "20m"]}
        for s in ["both", "val", "test"]
    }
    for i in range(len(pred_t)):
        dt, lt = M.eval_translation(new_t[i], gt_t[i])
        da, la = M.eval_angle(float(pred_a[i, 0]), float(gt_a[i, 0]), accept_inverted)
        lv = np.minimum(lt, la)
        for s in ["both", "val", "test"]:
            if dt > 10000:
                continue
            if s == "val" and is_test[i]:
                continue
            if s == "test" and not is_test[i]:
                continue
            cd = np.linalg.norm(gt_c[i])
            for key, lim in [("all", np.inf), ("5m", 5), ("10m", 10),
                             ("15m", 15), ("20m", 20)]:
                if cd > lim:
                    continue
                node = measures[s][key]
                node["num"] += 1
                node["corr_levels_translation"] += lt
                node["mean_dist_translation"] += dt
                node["mean_sq_dist_translation"] += dt * dt
                node["corr_levels_angles"] += la
                node["mean_dist_angle"] += da
                node["mean_sq_dist_angle"] += da * da
                node["corr_levels"] += lv
    for s in measures:
        for key in measures[s]:
            node = measures[s][key]
            num = float(node["num"]) if node["num"] else 1e-20
            node["corr_levels_translation"] = node["corr_levels_translation"] / num
            node["mean_dist_translation"] /= num
            node["mean_sq_dist_translation"] = np.sqrt(
                node["mean_sq_dist_translation"] / num
            )
            node["corr_levels_angles"] = node["corr_levels_angles"] / num
            node["mean_dist_angle"] /= num
            node["mean_sq_dist_angle"] = np.sqrt(node["mean_sq_dist_angle"] / num)
            node["corr_levels"] = node["corr_levels"] / num
    return measures


@pytest.mark.parametrize("accept_inverted", [False, True])
def test_evaluate_matches_reference_loop(tmp_path, accept_inverted):
    rng = np.random.default_rng(42)
    n = 1200  # positions >= 1000 become 'test' under the Synth rule
    pred_t = rng.normal(scale=0.2, size=(n, 3))
    pred_a = rng.uniform(-np.pi, np.pi, (n, 1))
    gt_t = pred_t + rng.normal(scale=0.08, size=(n, 3))
    gt_a = pred_a + rng.normal(scale=0.05, size=(n, 1))
    pred_c = rng.normal(scale=5.0, size=(n, 3))
    gt_c = pred_c + rng.normal(scale=0.5, size=(n, 3))

    cfg = config_from_dict({"data": {"basepath": str(tmp_path / "SynthX")}})
    # Synth rule: POSITION in val_idxs >= 1000 is test — the reference's
    # loop counter, not the file index (evaluation.py:156, 161).
    val_idxs = list(range(900, 900 + n))
    metas = [dict() for _ in range(n)]

    eval_dict = M.evaluate(
        cfg, val_idxs, pred_t, pred_a, gt_t, gt_a, pred_c, gt_c,
        eval_dir=None, accept_inverted_angle=accept_inverted, metas=metas,
    )
    ref = _reference_loop_eval(
        pred_t, pred_a, gt_t, gt_a, pred_c, gt_c, accept_inverted,
        np.arange(n) >= 1000,
    )

    d = M.ns_to_dict(eval_dict)
    for scope, node in [("both", d), ("val", d["val"]), ("test", d["test"])]:
        r = ref[scope]["all"]
        np.testing.assert_allclose(node["corr_levels"], r["corr_levels"], atol=1e-12)
        np.testing.assert_allclose(
            node["corr_levels_translation"], r["corr_levels_translation"], atol=1e-12
        )
        np.testing.assert_allclose(
            node["corr_levels_angles"], r["corr_levels_angles"], atol=1e-12
        )
        assert node["mean_dist_translation"] == pytest.approx(
            r["mean_dist_translation"], rel=1e-12
        )
        assert node["mean_sq_dist_angle"] == pytest.approx(
            r["mean_sq_dist_angle"], rel=1e-12
        )
        assert node["num"] == r["num"]
        for key in ["5m", "10m", "15m", "20m"]:
            rb = ref[scope][f"{key}"]
            nb = node[f"eval_{key}"]
            assert nb["num"] == rb["num"]
            np.testing.assert_allclose(nb["corr_levels"], rb["corr_levels"], atol=1e-12)


def test_eval_json_write_backup_and_meantime(tmp_path):
    cfg = config_from_dict({"data": {"basepath": str(tmp_path / "SynthX")}})
    n = 10
    rng = np.random.default_rng(0)
    args = (
        cfg, list(range(n)), rng.normal(size=(n, 3)),
        rng.uniform(-1, 1, (n, 1)), rng.normal(size=(n, 3)),
        rng.uniform(-1, 1, (n, 1)), np.zeros((n, 3)), np.zeros((n, 3)),
    )
    eval_dir = str(tmp_path / "eval000000")
    d1 = M.evaluate(*args, eval_dir=eval_dir, metas=[{}] * n, mean_time=0.5)
    assert os.path.isfile(f"{eval_dir}/eval.json")
    saved = json.load(open(f"{eval_dir}/eval.json"))
    assert saved["mean_time"] == 0.5
    assert "corr_levels" in saved and "val" in saved and "test" in saved
    assert "eval_5m" in saved and "reg_eval" in saved
    # rerun with mean_time=0: previous mean_time preserved + backup written
    M.evaluate(*args, eval_dir=eval_dir, metas=[{}] * n, mean_time=0)
    saved2 = json.load(open(f"{eval_dir}/eval.json"))
    assert saved2["mean_time"] == 0.5
    backups = [f for f in os.listdir(eval_dir) if f.startswith("eval_2")]
    assert len(backups) == 1
    # accept_inverted writes eval_180.json
    M.evaluate(*args, eval_dir=eval_dir, metas=[{}] * n,
               accept_inverted_angle=True)
    assert os.path.isfile(f"{eval_dir}/eval_180.json")


def test_velocity_tracks_written(tmp_path):
    cfg = config_from_dict({"data": {"basepath": str(tmp_path / "KITTIX")}})
    n = 6
    metas = [
        {"seq": 1, "trackids": [3, 3], "frames": [i, i + 1]} for i in range(n)
    ]
    eval_dir = str(tmp_path / "evalv")
    M.evaluate(
        cfg, list(range(n)),
        np.tile(np.array([[1.0, 0, 0]]), (n, 1)), np.zeros((n, 1)),
        np.zeros((n, 3)), np.zeros((n, 1)), np.zeros((n, 3)),
        np.zeros((n, 3)), eval_dir=eval_dir, metas=metas,
    )
    vel_dir = os.path.join(eval_dir, "velocities")
    assert os.path.isdir(vel_dir)
    files = os.listdir(vel_dir)
    assert len(files) >= 1
    vals = [float(x) for x in open(os.path.join(vel_dir, files[0]))]
    # constant translation 1m per 0.1s -> 10 m/s everywhere except the
    # zero-padded first entry's window
    assert vals[-1] == pytest.approx(10.0, rel=0.35)


def test_is_test_rules(tmp_path):
    assert M._is_test({"trackids": [2, 2]}, "x/KITTITrackletsCars", 0) is True
    assert M._is_test({"trackids": [4, 4]}, "x/KITTITrackletsCars", 0) is False
    assert M._is_test({}, "x/SynthCars", 999) is False
    assert M._is_test({}, "x/SynthCars", 1000) is True
    assert M._is_test(None, "x/Other", 5000) is False
