#!/usr/bin/env python
"""Re-run ONLY on-chip smoke check 6 (fused TRAINING edge stage) and
patch its entry in docs/onchip_smoke.json in place.

Round-5 context: the full smoke at round open recorded edge_train_fused
FAIL (grad_rel_err 1.48) — TWO stacked causes, both since fixed:
(a) bf16 MXU rounding corrupting the backward's dynamic slot-row index
extraction for indices > 256 (edge_train_kernels._slot_idx, fixed to
integer VPU arithmetic), and (b) the check's REFERENCE gradient itself:
jit(grad()) of the naive jnp.max graph is wrong on jax 0.9.0 (XLA
reduce_max VJP drops cotangents under remat — FD-proven,
ops/stable_max.py); the check now references the stable_max-routed
graph and gates on relative L2 (see onchip_smoke._check_edge_train_fused
docstring). This script revalidates just that check in the queue's next
TPU slot without paying the other five checks' compile time, and adds a
second exactness row at the flagship DGCNN shape (N=1024) where 75% of
neighbor indices exceed the bf16-exact range.

Run ONLY through the serialized TPU queue (CLAUDE.md tunnel gotchas).
Usage: python scripts/smoke6_recheck.py [docs/onchip_smoke.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from onchip_smoke import (  # noqa: E402
    _check_edge_train_fused,
    _check_edge_train_fused_highest,
    timed_ms,
)


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "onchip_smoke.json")

    import jax
    import jax.numpy as jnp

    from alignnet3d_tpu.ops.knn import knn, pairwise_distance

    report = json.load(open(out_path))
    results = {}

    def record(name, ok, **extra):
        results[name] = {"ok": bool(ok), **extra}
        print(f"[smoke6] {name}: {'OK' if ok else 'FAIL'} {extra}",
              flush=True)

    rng = np.random.default_rng(5)
    be, ne, ke = 128, 512, 20
    tmeas = timed_ms
    if os.environ.get("SMOKE6_TINY"):
        # CPU mechanics self-test: tiny shapes, no timing (interpret-mode
        # Pallas is far too slow for the chained-scan timer)
        be, ne = 4, 320
        tmeas = lambda fn, feed, probe: 0.0  # noqa: E731
    ptse = jnp.asarray(rng.normal(size=(be, ne, 3)), jnp.float32)
    idxe = knn(pairwise_distance(ptse), ke)
    w1 = jnp.asarray(rng.normal(size=(6, 64)) / 2.0, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(64,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(64, 128)) / 8.0, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(128,)) * 0.1, jnp.float32)
    try:
        _check_edge_train_fused(record, tmeas, rng, jnp, ptse, idxe,
                                w1, b1, w2, b2, be, ne, ke)
    except Exception as e:  # compile failure must still record
        record("edge_train_fused", False, error=repr(e)[:300])

    # LOGIC-exactness rows (round-5): both sides at HIGHEST matmul
    # precision, where bf16 near-tie routing flips vanish and only
    # real bugs remain (see _check_edge_train_fused_highest). One at
    # the timing shape, one at the flagship DGCNN shape — N=1024 puts
    # 75% of neighbor indices above the bf16-exact integer range, the
    # round-5 index-corruption class.
    try:
        _check_edge_train_fused_highest(record, rng, jnp, ptse, idxe,
                                        w1, b1, w2, b2, ne)
    except Exception as e:
        record("edge_train_fused_highest", False, error=repr(e)[:300])
    be2, ne2 = (2, 640) if os.environ.get("SMOKE6_TINY") else (32, 1024)
    pts2 = jnp.asarray(rng.normal(size=(be2, ne2, 3)), jnp.float32)
    idx2 = knn(pairwise_distance(pts2), ke)
    try:
        _check_edge_train_fused_highest(record, rng, jnp, pts2, idx2,
                                        w1, b1, w2, b2, ne2,
                                        name="edge_train_fused_n1024")
    except Exception as e:
        record("edge_train_fused_n1024", False, error=repr(e)[:300])

    report["checks"].update(results)
    report["date"] = time.strftime("%Y-%m-%d %H:%M")
    report["ok"] = all(c.get("ok") for c in report["checks"].values())
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(f"[smoke6] wrote {out_path} ok={report['ok']}", flush=True)
    return 0 if all(c.get("ok") for c in results.values()) else 1


if __name__ == "__main__":
    sys.exit(main())
