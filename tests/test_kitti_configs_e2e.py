"""End-to-end: the four repo KITTI configs drive generate -> train -> eval.

The reference's headline datasets are KITTI tracklets
(tp_utils/pointcloud.py:597-738, configs/KITTITrackletsCars*.json). No
real KITTI data exists in this environment (BASELINE.md), so this
exercises the full path — tracking-label parse, object extraction,
dataset write, provider load, trainer, eval artifacts — on a synthetic
mini KITTI tracking tree, with the UNMODIFIED repo configs (only
basepath / size knobs overridden, as a user pointing the config at their
own KITTI extract would).
"""

import json
import os

import numpy as np
import pytest

from alignnet3d_tpu.data import kitti
from alignnet3d_tpu.data.kitti_generate import generate_kitti_dataset

FRAMES = 10  # 9 consecutive pairs per track

# (track id, class, (h, w, l), lateral offset, speed, n surface points)
TRACKS = (
    (0, "Car", (1.5, 1.7, 4.0), 1.5, 0.3, 200),
    (1, "Pedestrian", (1.7, 0.6, 0.8), -2.0, 0.15, 150),
)


def _build_tree(root, rng):
    """Two sequences (0 -> train, 2 -> val), one car + one pedestrian
    track each, velodyne scans with background clutter."""
    for seq, base_z in ((0, 8.0), (2, 9.0)):
        velo = os.path.join(root, "training", "velodyne", f"{seq:04d}")
        os.makedirs(velo, exist_ok=True)
        label_lines = []
        for frame in range(FRAMES):
            pts_frame = [rng.uniform(-30, 30, (500, 3))]
            for tid, cls, (h, w, l), off, speed, npts in TRACKS:
                x = off + speed * frame
                roty = 0.1 + 0.05 * frame
                label_lines.append(
                    f"{frame} {tid} {cls} 0 0 -1.5 100 100 200 200 "
                    f"{h} {w} {l} {x} 1.5 {base_z} {roty}"
                )
                R = kitti.roty(roty)
                local = rng.uniform(-0.45, 0.45, (npts, 3)) * np.array(
                    [l, h, w]
                )
                center_rect = (
                    np.array([x, 1.5, base_z]) + R @ np.array([0, -h / 2, 0])
                )
                pts_rect = local @ R.T + center_rect
                pts_frame.append(pts_rect @ kitti.R_KITTI2GLOBAL)
            scan = np.concatenate(pts_frame).astype(np.float32)
            scan4 = np.concatenate(
                [scan, np.ones((len(scan), 1), np.float32)], axis=1
            )
            scan4.tofile(os.path.join(velo, f"{frame:06d}.bin"))
        label_dir = os.path.join(root, "training", "label_02")
        os.makedirs(label_dir, exist_ok=True)
        with open(os.path.join(label_dir, f"{seq:04d}.txt"), "w") as f:
            f.write("\n".join(label_lines) + "\n")
    return root


# config name -> generator kwargs (matching the reference's dataset
# recipes: Cars = Car/Van, Persons adds pedestrians, Hard widens the
# occlusion/truncation filters)
CONFIGS = {
    "KITTITrackletsCars": {},
    "KITTITrackletsCarsHard": {"hard": True},
    "KITTITrackletsCarsPersons": {"classes": ("Car", "Van", "Pedestrian")},
    "KITTITrackletsCarsPersonsHard": {
        "classes": ("Car", "Van", "Pedestrian"),
        "hard": True,
    },
}


@pytest.fixture(scope="module")
def kitti_datasets(tmp_path_factory):
    rng = np.random.default_rng(4)
    root = _build_tree(str(tmp_path_factory.mktemp("kitti_tree")), rng)
    out_base = str(tmp_path_factory.mktemp("datasets"))
    paths = {}
    for name, kwargs in CONFIGS.items():
        out = os.path.join(out_base, name)
        train_idx, val_idx = generate_kitti_dataset(
            root, out, use_vo=False, **kwargs
        )
        n_tracks = 2 if "Persons" in name else 1
        assert len(train_idx) == (FRAMES - 1) * n_tracks
        assert len(val_idx) == (FRAMES - 1) * n_tracks
        paths[name] = out
    return paths


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_kitti_config_trains_end_to_end(name, kitti_datasets, tmp_path):
    from alignnet3d_tpu.cli import main

    cfg = json.load(open(f"configs/{name}.json"))
    cfg["data"]["basepath"] = kitti_datasets[name]
    cfg["logging"] = {"basedir": str(tmp_path / "runs")}
    cfg["training"]["num_epochs"] = 1
    cfg["training"]["batch_size"] = 8
    cfg["model"]["num_points"] = 64
    # the repo configs warm-start from the SynthCars run (the reference's
    # KITTI recipe); no such checkpoint in the test sandbox
    cfg["training"].pop("pretraining", None)
    cfg_path = str(tmp_path / f"{name}.json")
    json.dump(cfg, open(cfg_path, "w"))

    main(["train", "--config", cfg_path])

    run_dir = os.path.join(str(tmp_path / "runs"), name)
    evals = sorted(
        d for d in os.listdir(os.path.join(run_dir, "val"))
        if d.startswith("eval")
    )
    table = json.load(
        open(os.path.join(run_dir, "val", evals[-1], "eval.json"))
    )
    assert len(table["corr_levels"]) == 3
    assert all(0.0 <= v <= 1.0 for v in table["corr_levels"])
