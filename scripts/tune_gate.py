"""Refinement-gate tuning grid (round 2).

Re-runs the gated ICP refinement over a finished run's cached network
predictions (--use_old_results) for several gate/radius settings and
prints one summary line per variant from the refined eval_180.json.

Usage: python scripts/tune_gate.py <run_config.json> <eval_epoch>
"""

import json
import os
import shutil
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPO = os.path.join(os.path.dirname(__file__), "..")

VARIANTS = {
    # name: (max_dyaw_deg, max_dxy, radius, its)
    "base_d10_x0.5_r0.10": (10.0, 0.5, 0.10, 30),
    "tight_d5_x0.25_r0.10": (5.0, 0.25, 0.10, 30),
    "loose_d20_x0.75_r0.10": (20.0, 0.75, 0.10, 30),
    "fine_d10_x0.5_r0.05": (10.0, 0.5, 0.05, 45),
    "loosefine_d20_x0.75_r0.05": (20.0, 0.75, 0.05, 45),
}


def main():
    cfg_path, epoch = sys.argv[1], int(sys.argv[2])
    base = json.load(open(cfg_path))
    run_dir = os.path.join(
        base["logging"]["basedir"],
        os.path.splitext(os.path.basename(cfg_path))[0],
    )
    eval_dir = os.path.join(run_dir, "val", f"eval{epoch:06d}")
    for name, (dyaw, dxy, radius, its) in VARIANTS.items():
        cfg = json.loads(json.dumps(base))
        cfg["evaluation"]["refinement_gate"] = {
            "enabled": True, "max_dyaw_deg": dyaw, "max_dxy": dxy,
        }
        cfg["evaluation"]["refinement"] = {"radius": radius}
        # the run name (and thus logdir) derives from the config FILENAME
        # (config.py load_config); keep the filename identical to the
        # original so the variant resolves to the same run directory
        tmp_dir = f"/tmp/gate_cfgs/{name}"
        os.makedirs(tmp_dir, exist_ok=True)
        tmp = os.path.join(tmp_dir, os.path.basename(cfg_path))
        json.dump(cfg, open(tmp, "w"))
        proc = subprocess.run(
            [sys.executable, "train.py", "eval_only", "--config", tmp,
             "--refineICP", "--its", str(its), "--use_old_results",
             "--eval_epoch", str(epoch)],
            cwd=REPO, capture_output=True, text=True, timeout=1800,
        )
        suffix = f"_{its}" if its != 30 else ""
        refined = os.path.join(
            eval_dir, f"refined_p2p{suffix}", "eval_180.json")
        if proc.returncode != 0 or not os.path.isfile(refined):
            print(f"{name}: FAILED rc={proc.returncode}")
            print(proc.stderr[-2000:])
            continue
        e = json.load(open(refined))
        shutil.copy(refined, f"/tmp/gate_{name}_eval180.json")
        lv = e["corr_levels"]
        ang = e["corr_levels_angles"]
        print(
            f"{name}: both "
            f"{lv[0]*100:.2f}/{lv[1]*100:.2f}/{lv[2]*100:.2f}  "
            f"yaw {ang[0]*100:.2f}/{ang[2]*100:.2f}  "
            f"t={e.get('mean_time', 0)*1e3:.1f}ms", flush=True,
        )


if __name__ == "__main__":
    main()
