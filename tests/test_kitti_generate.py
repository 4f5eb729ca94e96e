"""KITTI dataset generator on a synthetic mini KITTI-tracking tree."""

import json
import os

import numpy as np
import pytest

from alignnet3d_tpu.data import kitti
from alignnet3d_tpu.data.kitti_generate import generate_kitti_dataset


@pytest.fixture
def mini_kitti(tmp_path, rng):
    """Two sequences with one moving car each; velodyne scans contain the
    car's surface points plus background clutter."""
    root = tmp_path / "kitti"
    for seq, trackid, base_z in ((0, 0, 8.0), (2, 0, 9.0)):
        (root / "training" / "velodyne" / f"{seq:04d}").mkdir(parents=True)
        label_lines = []
        for frame in range(3):
            # rect-frame box: moving forward 0.3/frame, yaw drifting
            x = 1.0 + 0.3 * frame
            roty = 0.1 + 0.05 * frame
            box = np.array([x, 1.5, base_z, 1.5, 1.7, 4.0, roty])
            label_lines.append(
                f"{frame} {trackid} Car 0 0 -1.5 100 100 200 200 "
                f"1.5 1.7 4.0 {x} 1.5 {base_z} {roty}"
            )
            # points inside the box (in velo coords) + clutter
            R = kitti.roty(roty)
            local = rng.uniform(-0.45, 0.45, (200, 3)) * np.array(
                [4.0, 1.5, 1.7]
            )
            center_rect = box[:3] + R @ np.array([0, -box[3] / 2, 0])
            pts_rect = local @ R.T + center_rect
            pts_velo = pts_rect @ kitti.R_KITTI2GLOBAL  # inverse of @R.T
            clutter = rng.uniform(-30, 30, (500, 3))
            scan = np.concatenate([pts_velo, clutter]).astype(np.float32)
            scan4 = np.concatenate(
                [scan, np.ones((len(scan), 1), np.float32)], axis=1
            )
            scan4.tofile(
                root / "training" / "velodyne" / f"{seq:04d}" /
                f"{frame:06d}.bin"
            )
        (root / "training" / "label_02").mkdir(parents=True, exist_ok=True)
        (root / "training" / "label_02" / f"{seq:04d}.txt").write_text(
            "\n".join(label_lines) + "\n"
        )
    return str(root)


def test_generate_kitti_dataset(mini_kitti, tmp_path):
    out = str(tmp_path / "KITTITrackletsCars")
    train_idx, val_idx = generate_kitti_dataset(
        mini_kitti, out, use_vo=False, min_points=10,
    )
    # 2 consecutive pairs per sequence; seq 2 goes to val
    assert len(train_idx) == 2 and len(val_idx) == 2

    from alignnet3d_tpu.data.provider import load_meta, parse_meta_labels

    meta = load_meta(out, 0)
    t, ra, c1, c2, a1, a2 = parse_meta_labels(meta)
    assert meta["seq"] == 0
    assert ra == pytest.approx(0.05, abs=1e-6)
    assert t[2] == 0.0  # ground-plane constrained
    # translation magnitude ~0.3 in xy
    assert np.linalg.norm(t[:2]) == pytest.approx(0.3, abs=0.05)
    pc1 = np.load(f"{out}/pointcloud1/00000000.npy")
    assert len(pc1) >= 150  # the object's points, clutter excluded
    # extracted points lie near the labeled global center
    assert np.linalg.norm(pc1.mean(axis=0) - c1) < 2.0

    # the dataset loads through the standard provider stack
    from alignnet3d_tpu.data.provider import PackedDataset

    ds = PackedDataset(out)
    batch = ds.sample_batch(val_idx, 32, np.random.default_rng(0))
    assert batch[0].shape == (2, 32, 3)


def test_hard_variant_keeps_more(mini_kitti, tmp_path):
    """With an occluded object, the easy filter drops it and hard keeps it."""
    # rewrite seq 0 labels with occlusion 2
    label = f"{mini_kitti}/training/label_02/0000.txt"
    lines = open(label).read().splitlines()
    lines = [l.replace(" Car 0 0 ", " Car 0 2 ") for l in lines]
    open(label, "w").write("\n".join(lines) + "\n")
    easy_out = str(tmp_path / "easy")
    hard_out = str(tmp_path / "hard")
    tr_e, va_e = generate_kitti_dataset(mini_kitti, easy_out, use_vo=False)
    tr_h, va_h = generate_kitti_dataset(mini_kitti, hard_out, use_vo=False,
                                        hard=True)
    assert len(tr_e) == 0          # occluded track filtered in easy mode
    assert len(tr_h) == 2          # kept in hard mode
