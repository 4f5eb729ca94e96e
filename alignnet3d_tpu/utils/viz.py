"""Offline scene visualization: render a registration pair + predicted
alignment to a PNG.

Replacement for the reference's pythreejs notebook viewer
(reference tp_utils/pointcloud.py:1322-1485, VisualizationScene) — the
same inspection capability (two clouds, centers, predicted vs GT motion)
as headless matplotlib figures instead of an interactive widget.
"""

from __future__ import annotations

import numpy as np

from alignnet3d_tpu.geometry import get_mat_angle, transform_points


def render_pair(
    pc1: np.ndarray,
    pc2: np.ndarray,
    pred_translation=None,
    pred_angle=None,
    pred_center=None,
    gt_translation=None,
    gt_angle=None,
    gt_center=None,
    out_path: str | None = None,
    title: str = "",
):
    """Top-down (xy) + side (xz) scatter of the pair; optionally overlays
    pc1 moved by the predicted and/or GT motion. Returns the figure."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(12, 6))
    views = [("top view (x-y)", 0, 1), ("side view (x-z)", 0, 2)]

    layers = [(pc1, "tab:blue", "pc1"), (pc2, "tab:red", "pc2")]
    if pred_translation is not None:
        moved = transform_points(
            pc1,
            get_mat_angle(
                pred_translation, pred_angle,
                np.zeros(3) if pred_center is None else pred_center,
            ),
        )
        layers.append((moved, "tab:green", "pc1 @ prediction"))
    if gt_translation is not None:
        moved = transform_points(
            pc1,
            get_mat_angle(
                gt_translation, gt_angle,
                np.zeros(3) if gt_center is None else gt_center,
            ),
        )
        layers.append((moved, "tab:orange", "pc1 @ ground truth"))

    for ax, (name, i, j) in zip(axes, views):
        for pts, color, label in layers:
            pts = np.asarray(pts)
            if len(pts):
                ax.scatter(pts[:, i], pts[:, j], s=2, c=color, label=label,
                           alpha=0.6)
        ax.set_title(name)
        ax.set_aspect("equal")
        ax.legend(loc="best", fontsize=8)
    fig.suptitle(title)
    fig.tight_layout()
    if out_path is not None:
        fig.savefig(out_path, dpi=110)
        plt.close(fig)
    return fig


def render_eval_samples(cfg, eval_dir: str, sample_indices, out_dir: str,
                        dataset=None):
    """Render prediction overlays for chosen val samples from a completed
    eval directory's artifacts."""
    import os

    from alignnet3d_tpu.data.provider import PackedDataset, getDataFiles

    if dataset is None:
        dataset = PackedDataset(cfg.data.basepath)
    val_idxs = getDataFiles(f"{cfg.data.basepath}/split/val.txt")
    pred_t = np.load(f"{eval_dir}/pred_translations.npy")
    pred_a = np.load(f"{eval_dir}/pred_angles.npy")
    pred_c = np.load(f"{eval_dir}/pred_s2_pc1centers.npy")
    os.makedirs(out_dir, exist_ok=True)
    rows = dataset.rows(val_idxs)
    for pos in sample_indices:
        row = rows[pos]
        o1, c1 = dataset.offsets1[row], dataset.counts1[row]
        o2, c2 = dataset.offsets2[row], dataset.counts2[row]
        pc1 = dataset.points1[o1: o1 + c1]
        pc2 = dataset.points2[o2: o2 + c2]
        render_pair(
            pc1, pc2,
            pred_translation=pred_t[pos], pred_angle=float(pred_a[pos]),
            pred_center=pred_c[pos],
            gt_translation=dataset.translations[row],
            gt_angle=float(dataset.rel_angles[row, 0]),
            gt_center=dataset.pc1centers[row],
            out_path=os.path.join(out_dir, f"sample_{val_idxs[pos]:08d}.png"),
            title=f"val sample {val_idxs[pos]}",
        )
