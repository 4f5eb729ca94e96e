"""Round-4 completion-prior A/B: analysis + flagship decision.

Compares the two 60-epoch arms (SynthCars40kBaseR4 vs SynthCars40kCompR4)
on (a) the eval_180 success table and (b) the per-view s2-center xy error
medians — the quantity the completion prior targets (docs/RESULTS.md
"per-view center identifiability": the reference re-bases predicted
translations through the predicted center, evaluation.py:129, so per-view
center error binds the <2 cm bucket).

Decision rule (written to /root/data/r4_ab_decision.json): pick the
completion arm for the 80k flagship iff it improves the per-view center
median AND does not lose more than 0.5 pt <20 cm overall.

Extra arms trained later against the same base (e.g. the round-4
center-consistency probe) reuse the metric with
``--arm <name>=<run_name> [--out <json>]``: each named arm is compared
to 'base' under the same rule, no flagship pick is rewritten.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from alignnet3d_tpu.data.provider import getDataFiles
from alignnet3d_tpu.geometry import str_to_np

RUNS = {"base": "SynthCars40kBaseR4", "comp": "SynthCars40kCompR4"}


def latest_eval_dir(run):
    """Latest NETWORK-ONLY eval dir of a run's val split.

    Eval dirs produced with network_refine/ICP on origin-reset the
    predicted s2 centers (trainer.py origin-reset, reference
    train.py:483-484 semantics) — their pred_s2_pc*centers.npy are
    all-zeros and meaningless for the per-view center metric (the
    round-4 80k decision artifact read those zeros as 407cm medians).
    Scan from the latest eval backwards and refuse refined dirs.
    """
    vd = f"/root/data/runs/{run}/val"
    evals = sorted(p for p in os.listdir(vd) if p.startswith("eval")
                   and os.path.isfile(f"{vd}/{p}/eval_180.json"))
    for p in reversed(evals):
        c1 = np.load(f"{vd}/{p}/pred_s2_pc1centers.npy")
        if np.any(np.abs(c1) > 1e-9):
            return f"{vd}/{p}"
        print(f"  (skipping {vd}/{p}: refined eval, centers origin-reset)",
              flush=True)
    raise SystemExit(
        f"no network-only eval dir in {vd} — re-run eval WITHOUT "
        f"--refineICP/network_refine to get per-view center medians")


def main():
    runs = dict(RUNS)
    out_path = "/root/data/r4_ab_decision.json"
    write_pick = True
    if "--arm" in sys.argv:
        # comparison-only mode: base + the named arms, separate output
        runs = {"base": RUNS["base"]}
        if "--base" in sys.argv:
            # compare against a different baseline run (e.g. the 80k
            # R4Base flagship for the 80k center-sup readout)
            runs = {"base": sys.argv[sys.argv.index("--base") + 1]}
        for i, a in enumerate(sys.argv):
            if a == "--arm":
                name, run = sys.argv[i + 1].split("=", 1)
                runs[name] = run
        write_pick = False
        out_path = "/root/data/r4_arms_analysis.json"
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]

    def gt_for(run):
        # derive GT from the RUN's own dataset (runs differ in basepath:
        # 40k arms vs the 80k flagship vs fresh-777 evals)
        cfg = json.load(open(f"/root/data/runs/{run}/config.json"))
        base = cfg["data"]["basepath"]
        val = getDataFiles(f"{base}/split/val.txt")
        metas = [json.load(open(f"{base}/meta/{i:08d}.json")) for i in val]
        g1 = np.stack([str_to_np(m["start_position"]).reshape(3)
                       for m in metas])
        g2 = np.stack([str_to_np(m["end_position"]).reshape(3)
                       for m in metas])
        return g1, g2

    out = {}
    for arm, run in runs.items():
        gt1, gt2 = gt_for(run)
        d = latest_eval_dir(run)
        c1 = np.load(f"{d}/pred_s2_pc1centers.npy")
        c2 = np.load(f"{d}/pred_s2_pc2centers.npy")
        e = np.concatenate([
            np.linalg.norm((c1 - gt1)[:, :2], axis=1),
            np.linalg.norm((c2 - gt2)[:, :2], axis=1),
        ])
        rel = np.linalg.norm(((c2 - c1) - (gt2 - gt1))[:, :2], axis=1)
        ev = json.load(open(f"{d}/eval_180.json"))
        lv = [round(100 * x, 2) for x in ev["corr_levels"]]
        out[arm] = {
            "eval_dir": d,
            "center_xy_p50_cm": round(float(np.median(e)) * 100, 2),
            "center_xy_p90_cm": round(float(np.quantile(e, 0.9)) * 100, 2),
            "center_diff_xy_p50_cm": round(float(np.median(rel)) * 100, 2),
            "levels_180": lv,
        }
        print(f"{arm}: {d}\n  per-view center xy p50={out[arm]['center_xy_p50_cm']}cm "
              f"p90={out[arm]['center_xy_p90_cm']}cm | "
              f"center-DIFF p50={out[arm]['center_diff_xy_p50_cm']}cm | "
              f"eval_180 <2/10/20cm = {lv}", flush=True)

    b = out["base"]
    verdicts = {}
    for arm in out:
        if arm == "base":
            continue
        c = out[arm]
        verdicts[arm] = {
            "center_wins": bool(c["center_xy_p50_cm"] < b["center_xy_p50_cm"]),
            "holds_20cm": bool(c["levels_180"][2] >= b["levels_180"][2] - 0.5),
        }
    if write_pick:
        v = verdicts["comp"]
        pick = "comp" if (v["center_wins"] and v["holds_20cm"]) else "base"
        decision = {
            "pick": pick,
            "flagship_config": f"configs/SynthCars80kR4{'Comp' if pick == 'comp' else 'Base'}.json",
            "center_wins": v["center_wins"],
            "holds_20cm": v["holds_20cm"],
            "arms": out,
        }
        print(f"DECISION: {pick} -> {decision['flagship_config']}", flush=True)
    else:
        decision = {"verdicts": verdicts, "arms": out}
        for arm, v in verdicts.items():
            print(f"VERDICT {arm}: center_wins={v['center_wins']} "
                  f"holds_20cm={v['holds_20cm']}", flush=True)
    with open(out_path, "w") as f:
        json.dump(decision, f, indent=1)


if __name__ == "__main__":
    main()
