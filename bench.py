#!/usr/bin/env python
"""Headline benchmark: aligned point-cloud pairs / sec / chip.

Batched inference of the flagship AlignNet model (SynthCars-scale: N=512
points, 50 angle bins, bfloat16 compute) on the available accelerator.
Prints ONE JSON line. North-star baseline (BASELINE.md): 10,000
pairs/sec/chip on TPU v5e — ``vs_baseline`` is pairs_per_sec / 10,000.

Measurement notes: on this box the TPU is reached through a tunnel where
``block_until_ready`` does not actually block and each dispatch carries
~25 ms RTT. The benchmark therefore runs N_ITERS forwards CHAINED inside
one jitted ``lax.scan`` (each iteration's input is perturbed by the
previous output, so nothing can be elided) and forces one host readback;
the per-call overhead then amortizes below 2%.

``--mesh`` additionally data-parallelizes the batch over ALL local
devices via a 1-D ``jax.sharding.Mesh`` (params replicated, batch axis
sharded) and adds a ``devices`` field to the JSON line — the one-command
scaling measurement for whenever >1 chip is attached. ``--devices N``
forces an N-device virtual CPU mesh (for the scaling-curve sanity
artifact, docs/RESULTS.md "Virtual-mesh scaling sanity").
"""

from __future__ import annotations

import glob
import json
import os
import signal
import sys
import time

import numpy as np

N_ITERS = 50
# Batch sweep (round 3, closure-captured weights): 1024 -> 193k,
# 4096 -> 221.5k, 8192 -> 237.5k, 16384 -> 233k pairs/s; 8192 is the
# sweet spot (131 TFLOP/s, 66% of v5e bf16 peak by compiled
# cost_analysis). The BN-folded serving path is within noise of
# model.apply at these sizes, so the honest flax path stays.
BATCH = 8192


def _stop_training_chains():
    """Serialize with any live training chain before touching the TPU.

    Two clients dispatching concurrently wedge the tunnel server
    (CLAUDE.md gotchas), and the driver runs this benchmark unattended
    at round end — possibly while a nohup'd training supervisor is
    mid-epoch. Long-lived TPU jobs register their root pid in
    ``/tmp/tpu-chain-*.pid`` (scripts/train_supervised.sh,
    scripts/round3_chain.sh); this stops each registered root plus all
    its descendants (ppid tree walk over /proc — deliberately no
    command-line pattern matching) and gives the tunnel time to drain.

    Robustness details: a registered pid is only trusted when the
    process is OLDER than its pidfile (a recycled pid started after the
    file was written — stale, removed untouched), and the full target
    set is snapshotted BEFORE the first signal so children that
    reparent to init when their supervisor dies still get the SIGKILL
    escalation.
    """

    def start_epoch(pid):
        with open(f"/proc/{pid}/stat") as fh:
            ticks = int(fh.read().rsplit(")", 1)[1].split()[19])
        with open("/proc/stat") as fh:
            btime = next(int(line.split()[1]) for line in fh
                         if line.startswith("btime"))
        return btime + ticks / os.sysconf("SC_CLK_TCK")

    roots = []
    for pidfile in sorted(glob.glob("/tmp/tpu-chain-*.pid")):
        try:
            pid = int(open(pidfile).read().strip())
            if start_epoch(pid) > os.path.getmtime(pidfile) + 2.0:
                raise OSError("pid recycled since registration")
        except (OSError, ValueError, StopIteration):
            try:
                os.remove(pidfile)
            except OSError:
                pass
            continue
        roots.append((pidfile, pid))
    if not roots:
        return

    def descendants(root):
        children = {}
        for stat in glob.glob("/proc/[0-9]*/stat"):
            try:
                fields = open(stat).read().rsplit(")", 1)[1].split()
                pid = int(stat.split("/")[2])
                children.setdefault(int(fields[1]), []).append(pid)
            except (OSError, IndexError, ValueError):
                continue
        out, stack = [], [root]
        while stack:
            for child in children.get(stack.pop(), []):
                out.append(child)
                stack.append(child)
        return out

    # snapshot the whole tree once: roots first (so supervisors can't
    # respawn children), then children — survivors of SIGTERM stay in
    # the target list even after reparenting to init
    targets = []
    for _, pid in roots:
        targets.append(pid)
        targets.extend(descendants(pid))
    for sig, grace in ((signal.SIGTERM, 10), (signal.SIGKILL, 3)):
        alive = False
        for target in targets:
            try:
                os.kill(target, sig)
                alive = True
            except OSError:
                continue
        if not alive:
            break
        print(f"[bench] stopped training chains {[p for _, p in roots]} "
              f"({sig.name})", file=sys.stderr)
        time.sleep(grace)
    for pidfile, _ in roots:
        try:
            os.remove(pidfile)
        except OSError:
            pass
    time.sleep(20)  # let the tunnel drain before the first dispatch


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    use_mesh = "--mesh" in argv
    force_devices = 0
    if "--devices" in argv:
        pos = argv.index("--devices")
        if pos + 1 >= len(argv) or not argv[pos + 1].isdigit():
            print("usage: bench.py [--mesh] [--devices N]", file=sys.stderr)
            return 2
        force_devices = int(argv[pos + 1])
        use_mesh = True
    if force_devices:
        from alignnet3d_tpu.utils import force_cpu

        force_cpu(force_devices)
    else:
        _stop_training_chains()

    import jax
    import jax.numpy as jnp
    from functools import partial

    # defensive scale-down when no accelerator is present (e.g. a broken
    # tunnel): keep the contract (one JSON line) without a pathological
    # multi-minute CPU run
    global N_ITERS, BATCH
    if jax.devices()[0].platform == "cpu":
        N_ITERS, BATCH = 2, 64

    from alignnet3d_tpu.config import config_from_dict
    from alignnet3d_tpu.models.alignnet import AlignNet, ModelSpec

    cfg = config_from_dict({
        "model": {
            "num_points": 512,
            "options": {
                "angle_factor": 1.0,
                "early_stage_factor": 0.5,
                "s1transformer": [[64, 128, 256], [[512, 256], 0.7]],
                "s2transformer": [[64, 128, 512], [[512, 256], 0.7]],
                "embedding": [64, 128, 1024],
                "remaining_transform_prediction": [[512, 256], 0.7],
            },
            "angles": {"num_bins": 50, "accept_inverted_angle": True},
        },
        "tpu": {"compute_dtype": "bfloat16"},
    })
    spec = ModelSpec.from_config(cfg)
    model = AlignNet(spec)

    n_dev = len(jax.devices()) if use_mesh else 1
    B, N = BATCH * n_dev, spec.num_points
    rng = np.random.default_rng(0)
    pcs1 = jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32)
    pcs2 = jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        pcs1[:2], pcs2[:2], train=False,
    )

    if use_mesh:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        mesh = Mesh(np.asarray(jax.devices()), ("dp",))
        batch_sharding = NamedSharding(mesh, P("dp"))
        replicated = NamedSharding(mesh, P())
        pcs1 = jax.device_put(pcs1, batch_sharding)
        pcs2 = jax.device_put(pcs2, batch_sharding)
        variables = jax.device_put(variables, replicated)

    # Weights are CLOSURE-CAPTURED (compile-time constants), the
    # deployment semantics of a serving engine (jax.export/AOT does the
    # same): XLA then folds BN scales into the convs and bakes weight
    # layouts. Passing them as a jit argument costs 38% at B=4096 on the
    # v5e (160.8k vs 221.4k pairs/s, measured A/B round 3 — the runtime
    # relayout/no-fold penalty), so an argument-passed bench would
    # under-report the deployable throughput.
    @partial(jax.jit, static_argnums=(2,))
    def chained(a, b, n):
        def body(carry, _):
            a, b = carry
            out = model.apply(variables, a, b, train=False)
            delta = out["pred_translations"][:, None, :] * 1e-6
            return (a + delta, b - delta), out["pred_translations"][0, 0]

        _, probes = jax.lax.scan(body, (a, b), None, length=n)
        return probes

    # warmup + compile (host readback forces completion)
    np.asarray(chained(pcs1, pcs2, N_ITERS))

    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(chained(pcs1, pcs2, N_ITERS))
        best = min(best, time.perf_counter() - t0)

    pairs_per_sec = B * N_ITERS / best
    record = {
        "metric": "align_pairs_per_sec",
        "value": round(pairs_per_sec, 1),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / 10000.0, 3),
    }
    if use_mesh:
        record["devices"] = n_dev
    print(json.dumps(record))


if __name__ == "__main__":
    main()
