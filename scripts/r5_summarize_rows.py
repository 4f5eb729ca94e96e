"""Round-5 final-session results harvester.

Scans /root/data/runs/* eval dirs and prints one markdown table row per
(run, eval dir): the <2/<10/<20 cm buckets (eval_180.json corr_levels,
reference evaluation.py:214-246 level semantics), mean translation and
yaw error, and pair count. Used to transcribe the queue's eval rows
into docs/RESULTS.md without hand-copying log lines (wipe lesson:
numbers only count once they land in git).

Usage: python scripts/r5_summarize_rows.py [run_name ...]
       (no args = every run under /root/data/runs)
"""

import json
import os
import sys

RUNS = "/root/data/runs"


def rows_for(run):
    vd = os.path.join(RUNS, run, "val")
    if not os.path.isdir(vd):
        return
    for ed in sorted(os.listdir(vd)):
        p = os.path.join(vd, ed, "eval_180.json")
        if not os.path.isfile(p):
            continue
        try:
            e = json.load(open(p))
        except (ValueError, OSError):
            continue
        lv = e.get("corr_levels", [float("nan")] * 3)
        yield (run, ed, 100 * lv[0], 100 * lv[1], 100 * lv[2],
               e.get("mean_dist_translation", float("nan")),
               e.get("mean_dist_angle", float("nan")),
               e.get("num", 0))


def main():
    runs = sys.argv[1:] or sorted(os.listdir(RUNS))
    print("| run | eval | <2cm | <10cm | <20cm | mean t (m) | "
          "mean yaw (deg) | n |")
    print("|---|---|---|---|---|---|---|---|")
    for run in runs:
        for r in rows_for(run) or ():
            print("| {} | {} | {:.2f} | {:.2f} | {:.2f} | {:.3f} | "
                  "{:.2f} | {} |".format(*r))


if __name__ == "__main__":
    main()
