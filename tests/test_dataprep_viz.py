"""data_prep h5/PLY helpers and the offline visualizer."""

import os

import numpy as np
import pytest

from alignnet3d_tpu.utils import data_prep, viz


def test_h5_roundtrip(tmp_path, rng):
    data = rng.normal(size=(4, 32, 3)).astype(np.float32)
    label = np.arange(4, dtype=np.uint8)
    path = str(tmp_path / "x.h5")
    data_prep.save_h5(path, data, label, data_dtype="float32")
    d, l = data_prep.load_h5(path)
    np.testing.assert_allclose(d, data)
    np.testing.assert_array_equal(l, label)


def test_h5_with_normals(tmp_path, rng):
    data = rng.normal(size=(2, 16, 3)).astype(np.float32)
    normal = rng.normal(size=(2, 16, 3)).astype(np.float32)
    label = np.zeros(2, np.uint8)
    path = str(tmp_path / "n.h5")
    data_prep.save_h5_data_label_normal(path, data, label, normal)
    d, l, n = data_prep.load_h5_data_label_normal(path)
    np.testing.assert_allclose(n, normal)


def test_ply_prep_roundtrip(tmp_path, rng):
    pc = rng.normal(size=(20, 3))
    path = str(tmp_path / "p.ply")
    data_prep.export_ply(pc, path)
    back = data_prep.load_ply_data(path, 10)
    np.testing.assert_allclose(back, pc[:10], atol=1e-6)


def test_pad_arr_rows():
    arr = np.arange(6, dtype=float).reshape(3, 2)
    out = data_prep.pad_arr_rows(arr, 5)
    assert out.shape == (5, 2)
    np.testing.assert_array_equal(out[3], arr[-1])  # edge pad
    clipped = data_prep.pad_arr_rows(arr, 2)
    assert clipped.shape == (2, 2)


def test_render_pair_writes_png(tmp_path, rng):
    pc1 = rng.normal(size=(50, 3)) + [5, 0, 0]
    pc2 = pc1 + [0.5, 0.2, 0.0]
    out = str(tmp_path / "pair.png")
    viz.render_pair(
        pc1, pc2, pred_translation=[0.5, 0.2, 0.0], pred_angle=0.0,
        gt_translation=[0.5, 0.2, 0.0], gt_angle=0.0, out_path=out,
    )
    assert os.path.isfile(out) and os.path.getsize(out) > 1000

def test_export_html_scene(tmp_path, rng):
    pc1 = rng.normal(size=(40, 3)).astype(np.float32) + [5, 0, 0]
    pc2 = pc1 + [0.3, -0.1, 0.0]
    out = str(tmp_path / "scene.html")
    viz.export_html_scene(
        pc1, pc2, out,
        pred_translation=[0.3, -0.1, 0.0], pred_angle=0.1,
        pred_center=pc1.mean(0),
        gt_translation=[0.3, -0.1, 0.0], gt_angle=0.0,
        gt_center=pc1.mean(0),
        extra_layers=[("refined", pc1 + 0.01)],
    )
    text = open(out).read()
    # standalone: no external scripts/links
    assert "src=" not in text and "http" not in text.split("<body>")[1]
    for name in ("pc1", "pc2", "pc1 @ prediction", "pc1 @ ground truth",
                 "centers", "refined"):
        assert name in text
    # all six layers carry point data
    import json as _json
    blob = text.split("const LAYERS = ")[1].split(";\n")[0]
    layers = _json.loads(blob)
    assert len(layers) == 6 and all(len(l["pts"]) > 0 for l in layers)
