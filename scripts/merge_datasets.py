"""Merge synthetic dataset directories into one larger dataset (symlinks).

Builds a reference-layout dataset dir (meta/ + pointcloud{1,2}/ + split/)
whose scenes are symlinks into the source datasets, with indices
renumbered to avoid collisions. Train splits concatenate; the val split
is taken from the FIRST source only (so results stay directly comparable
with runs on that source's val protocol).

    python scripts/merge_datasets.py OUT SRC1 SRC2 [SRC3 ...]

Used for the scale-curve experiments (docs/RESULTS.md: dataset scale is
the dominant accuracy lever; 8k -> 20k -> 40k -> 80k scenes).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from alignnet3d_tpu.data.provider import getDataFiles  # noqa: E402


def link(src, dst):
    if os.path.islink(dst) or os.path.exists(dst):
        os.remove(dst)
    os.symlink(src, dst)


def main():
    out = sys.argv[1]
    sources = sys.argv[2:]
    assert len(sources) >= 2
    for sub in ("meta", "pointcloud1", "pointcloud2", "split"):
        os.makedirs(os.path.join(out, sub), exist_ok=True)

    next_idx = 0
    train_out, val_out = [], []
    for si, src in enumerate(sources):
        src = os.path.abspath(src)
        train = getDataFiles(f"{src}/split/train.txt")
        val = getDataFiles(f"{src}/split/val.txt") if si == 0 else []
        offset = next_idx
        used = sorted(set(train) | set(val))
        for idx in used:
            new = offset + idx
            link(f"{src}/meta/{idx:08d}.json",
                 f"{out}/meta/{new:08d}.json")
            for k in (1, 2):
                link(f"{src}/pointcloud{k}/{idx:08d}.npy",
                     f"{out}/pointcloud{k}/{new:08d}.npy")
        train_out.extend(offset + i for i in train)
        val_out.extend(offset + i for i in val)
        next_idx = offset + (max(used) + 1 if used else 0)
        print(f"{src}: {len(train)} train / {len(val)} val -> "
              f"offset {offset}")

    for name, idxs in (("train", train_out), ("val", val_out)):
        with open(f"{out}/split/{name}.txt", "w") as f:
            f.write("\n".join(str(i) for i in idxs) + "\n")
    print(f"merged: {len(train_out)} train / {len(val_out)} val -> {out}")


if __name__ == "__main__":
    main()
