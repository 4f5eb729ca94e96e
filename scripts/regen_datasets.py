"""Regenerate the round-3/4 synthetic datasets on a fresh box.

/root/data does not survive box resets (CLAUDE.md). This script rebuilds
the exact round-3 datasets (same seeds -> bit-identical scenes):

  SynthCars40k      38k train + 2k val   seed 21
  SynthCars40kB     40k train            seed 22
  SynthCarsValFresh 2k val               seed 777
  SynthCars80k      merge(40k, 40kB)     (symlinks, val = 40k's val)

Each dataset writes a .done marker so the run is resumable; a queued
chain can poll the markers. Generation is CPU-bound (~47 scenes/s on
these boxes -> ~30 min total).
"""

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from alignnet3d_tpu.data.synthetic import generate_dataset  # noqa: E402

JOBS = [
    ("/root/data/SynthCars40k", 38000, 2000, 21),
    ("/root/data/SynthCarsValFresh", 0, 2000, 777),
    ("/root/data/SynthCars40kB", 40000, 0, 22),
]


def main():
    for basepath, ntrain, nval, seed in JOBS:
        marker = basepath + ".done"
        if os.path.exists(marker):
            print(f"[regen] skip {basepath} (marker exists)", flush=True)
            continue
        t0 = time.time()
        print(f"[regen] generating {basepath} ({ntrain}+{nval}, seed={seed})",
              flush=True)
        generate_dataset(basepath, ntrain, nval, seed=seed)
        open(marker, "w").write(f"{time.time() - t0:.1f}s\n")
        print(f"[regen] {basepath} done in {time.time() - t0:.1f}s", flush=True)

    merged = "/root/data/SynthCars80k"
    if not os.path.exists(merged + ".done"):
        subprocess.check_call([
            sys.executable, os.path.join(os.path.dirname(__file__),
                                         "merge_datasets.py"),
            merged, "/root/data/SynthCars40k", "/root/data/SynthCars40kB"])
        open(merged + ".done", "w").write("merged\n")
        print("[regen] 80k merge done", flush=True)
    print("[regen] all datasets ready", flush=True)


if __name__ == "__main__":
    main()
