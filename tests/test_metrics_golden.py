"""Golden-value regression test for evaluate(): fixed inputs -> exact
hand-computed numbers (SURVEY.md §4(b))."""

import numpy as np
import pytest

from alignnet3d_tpu.config import config_from_dict
from alignnet3d_tpu.evaluation import metrics as M


def test_evaluate_golden_values():
    """4 samples with hand-constructed errors:

    idx 0: perfect (err 0 m, 0 deg)                -> passes all levels
    idx 1: 5 cm XY error, 3 deg angle error        -> levels (0,1,1)/(0,1,1)
    idx 2: 15 cm XY error, 12 deg angle error      -> levels (0,0,1)/(0,0,0)
    idx 3: 30 cm XY error, 0.5 deg angle error     -> levels (0,0,0)/(1,1,1)
    centers at distances {3, 7, 12, 18} m bucket them into 5m/10m/15m/20m.
    Rotation centers coincide so no rebase correction applies.
    """
    cfg = config_from_dict({"data": {"basepath": "x/SynthG"}})
    gt_t = np.zeros((4, 3))
    gt_a = np.zeros((4, 1))
    pred_t = np.array([
        [0.0, 0.0, 0.0],
        [0.05, 0.0, 0.7],   # z ignored by the XY metric
        [0.0, 0.15, 0.0],
        [0.3, 0.0, 0.0],
    ])
    pred_a = np.deg2rad([[0.0], [3.0], [12.0], [0.5]])
    centers = np.array([
        [3.0, 0, 0], [0, 7.0, 0], [12.0, 0, 0], [0, 18.0, 0]
    ])
    ev = M.evaluate(
        cfg, [0, 1, 2, 3], pred_t, pred_a, gt_t, gt_a,
        all_pred_centers=centers, all_gt_pc1centers=centers,
        metas=[{}] * 4,
    )
    assert ev.num == 4
    # translation levels: <2cm: 1/4; <10cm: 2/4; <20cm: 3/4
    assert ev.corr_levels_translation == [0.25, 0.5, 0.75]
    # angle levels: <1deg: idx0,idx3 -> 2/4; <5deg: +idx1 -> 3/4; <10deg: 3/4
    assert ev.corr_levels_angles == [0.5, 0.75, 0.75]
    # combined (elementwise min per sample then averaged):
    # idx0 (1,1,1); idx1 (0,1,1); idx2 (0,0,0); idx3 (0,0,0)
    assert ev.corr_levels == [0.25, 0.5, 0.5]
    assert ev.mean_dist_translation == pytest.approx(
        (0 + 0.05 + 0.15 + 0.3) / 4
    )
    assert ev.mean_dist_angle == pytest.approx((0 + 3 + 12 + 0.5) / 4)
    assert ev.mean_sq_dist_translation == pytest.approx(
        np.sqrt((0.05 ** 2 + 0.15 ** 2 + 0.3 ** 2) / 4)
    )
    # distance buckets: 5m contains only idx0 (perfect sample)
    assert ev.eval_5m.num == 1
    assert ev.eval_5m.corr_levels == [1.0, 1.0, 1.0]
    assert ev.eval_10m.num == 2
    assert ev.eval_15m.num == 3
    assert ev.eval_20m.num == 4
    # Synth rule with positions < 1000: all samples are 'val'
    assert ev.val.num == 4 and ev.test.num == 0
    # empty test subset gets the 1e-20 sentinel blow-up
    assert ev.test.mean_dist_translation == 0.0 or ev.test.num == 0


def test_evaluate_golden_rebase():
    """One sample where the rebase matters: rotation 90 deg about a center
    1 m off the GT center. new_t = -shift + R@shift + t with
    shift = gt_c - pred_c = (1,0,0): R@shift = (0,1,0) so
    new_t = (-1,1,0) + t."""
    cfg = config_from_dict({"data": {"basepath": "x/SynthG"}})
    pred_t = np.array([[1.0, -1.0, 0.0]])  # cancels the rebase exactly
    pred_a = np.array([[np.pi / 2]])
    gt_t = np.zeros((1, 3))
    gt_a = np.array([[np.pi / 2]])
    pred_c = np.array([[4.0, 0.0, 0.0]])
    gt_c = np.array([[5.0, 0.0, 0.0]])
    ev = M.evaluate(cfg, [0], pred_t, pred_a, gt_t, gt_a, pred_c, gt_c,
                    metas=[{}])
    assert ev.corr_levels_translation == [1.0, 1.0, 1.0]
    assert ev.mean_dist_translation == pytest.approx(0.0, abs=1e-9)
