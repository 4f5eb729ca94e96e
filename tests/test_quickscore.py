"""Tests for the shared tuning-script scorer (evaluation/quickscore.py).

The scorer reproduces the metric pipeline's rebase + success levels
(reference evaluation.py:16-46,129) and its POSITIONAL val/test rule
(reference evaluation.py:158-161) for the probe/tuning scripts.
"""

import numpy as np

from alignnet3d_tpu.evaluation.quickscore import (
    format_table,
    positional_is_test,
    success_table,
)
from alignnet3d_tpu.geometry import get_mat_angle


def _random_case(rng, n):
    gt_t = rng.normal(size=(n, 3))
    gt_a = rng.uniform(-np.pi, np.pi, size=n)
    gt_c = rng.normal(size=(n, 3))
    return gt_t, gt_a, gt_c


def test_perfect_predictions_score_one():
    rng = np.random.default_rng(0)
    gt_t, gt_a, gt_c = _random_case(rng, 16)
    tab = success_table(gt_t, gt_a, gt_c, gt_t, gt_a, gt_c,
                        is_test=np.zeros(16, bool))
    assert tab["all"] == [1.0, 1.0, 1.0]
    assert tab["val"] == [1.0, 1.0, 1.0]
    assert np.isnan(tab["test"]).all()


def test_rebase_matches_transform_equivalence():
    # a prediction expressed about a different rotation center but encoding
    # the SAME rigid transform must score perfectly after the rebase
    rng = np.random.default_rng(1)
    gt_t, gt_a, gt_c = _random_case(rng, 8)
    other_c = rng.normal(size=(8, 3))
    pred_t = np.empty_like(gt_t)
    for i in range(8):
        m_gt = get_mat_angle(gt_t[i], gt_a[i], gt_c[i])
        # same world transform, re-expressed about other_c:
        # t' = M @ [c'] - c'
        pred_t[i] = (m_gt[:3, :3] @ other_c[i] + m_gt[:3, 3]) - other_c[i]
    tab = success_table(pred_t, gt_a, other_c, gt_t, gt_a, gt_c,
                        is_test=np.zeros(8, bool))
    assert tab["val"] == [1.0, 1.0, 1.0]


def test_accept_inverted_flips():
    rng = np.random.default_rng(2)
    gt_t, gt_a, gt_c = _random_case(rng, 8)
    zeros = np.zeros_like(gt_c)
    flipped = gt_a + np.pi
    # rotation center at the GT center keeps translation unaffected by the
    # flip, isolating the angle acceptance rule
    tab = success_table(gt_t, flipped, gt_c, gt_t, gt_a, gt_c,
                        is_test=np.zeros(8, bool), accept_inverted=True)
    assert tab["val"] == [1.0, 1.0, 1.0]
    tab = success_table(gt_t, flipped, gt_c, gt_t, gt_a, gt_c,
                        is_test=np.zeros(8, bool), accept_inverted=False)
    assert tab["val"] == [0.0, 0.0, 0.0]


def test_positional_rule_and_format():
    m = positional_is_test(1500)
    assert not m[:1000].any() and m[1000:].all()
    tab = {"val": [0.048, 0.524, 0.808], "test": [0.039, 0.470, 0.786]}
    assert format_table(tab) == "val 4.8/52.4/80.8  test 3.9/47.0/78.6"
