"""Virtual-mesh scaling sanity curve (VERDICT round-1 item 8).

Runs ``bench.py --devices N`` for N in {1, 2, 4, 8} — each in a fresh
subprocess so the forced CPU platform with N virtual devices is clean —
and prints the collected JSON rows. On this box all N virtual devices
share ONE physical core, so the curve validates that the dp-sharded
program compiles and executes at every mesh size with flat-ish total
step time (real scaling needs real chips; the same flag measures it
there: ``python bench.py --mesh``).
"""

import json
import os
import subprocess
import sys

REPO = os.path.join(os.path.dirname(__file__), "..")


def main():
    rows = []
    for n in (1, 2, 4, 8):
        out = subprocess.run(
            [sys.executable, "bench.py", "--devices", str(n)],
            cwd=REPO, capture_output=True, text=True, timeout=1200,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        row = json.loads(line)
        rows.append(row)
        print(line, flush=True)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
