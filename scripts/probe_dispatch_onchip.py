"""On-chip economics probe for tpu.steps_per_dispatch (DESIGN.md §11).

Measures real-TPU training-epoch wall time at K=1 (one device dispatch
per optimizer step — the reference-style loop, train.py:214-260) vs
K=8 (lax.scan over 8 steps inside ONE jit dispatch,
trainer._train_multi_step_fn). The loop is dispatch-bound through the
tunnel (~25 ms RTT + host bookkeeping per dispatch vs ~3 ms batch
assembly), so K should recover most of the non-compute time.

Dataset content is irrelevant to the timing — a tiny low-res synthetic
set provides real provider batches at flagship shapes (N=1024, B=128,
full SynthCars model config). Writes docs/dispatch_probe_onchip.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from alignnet3d_tpu.config import load_config  # noqa: E402
from alignnet3d_tpu.data.synthetic import generate_dataset  # noqa: E402
from alignnet3d_tpu.training.trainer import ScalarWriter, Trainer  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORK = "/tmp/probe_dispatch"
N_TRAIN, N_VAL, BATCH = 2048, 8, 128
TIMED_EPOCHS = 3


def make_cfg(base, k):
    # flagship-shaped model (SynthCars.json architecture, N=1024)
    with open(os.path.join(ROOT, "configs", "SynthCars.json")) as f:
        d = json.load(f)
    d["data"]["basepath"] = base
    d["logging"] = {"basedir": os.path.join(WORK, f"runs_k{k}")}
    d["model"]["num_points"] = 1024
    d["training"]["batch_size"] = BATCH
    d["training"]["num_epochs"] = 1 + TIMED_EPOCHS
    if k > 1:
        d["tpu"] = dict(d.get("tpu", {}), steps_per_dispatch=k)
    path = os.path.join(WORK, f"probe_k{k}.json")
    with open(path, "w") as f:
        json.dump(d, f, indent=2)
    return load_config(path)


def run_arm(base, k):
    cfg = make_cfg(base, k)
    os.makedirs(cfg.logging.logdir, exist_ok=True)
    trainer = Trainer(cfg, seed=7)
    state = trainer._place_state(trainer.init_state())
    writer = ScalarWriter(os.path.join(cfg.logging.logdir, "scalars.jsonl"))
    # epoch 0 pays compile
    t0 = time.perf_counter()
    state = trainer.train_one_epoch(state, 0, writer)
    jax.block_until_ready(state.params)
    compile_s = time.perf_counter() - t0
    times = []
    for ep in range(1, 1 + TIMED_EPOCHS):
        t0 = time.perf_counter()
        state = trainer.train_one_epoch(state, ep, writer)
        jax.block_until_ready(state.params)
        times.append(time.perf_counter() - t0)
    steps = N_TRAIN // BATCH
    med = sorted(times)[len(times) // 2]
    row = {
        "k": k,
        "epoch0_with_compile_s": round(compile_s, 2),
        "timed_epochs_s": [round(t, 3) for t in times],
        "median_s_per_epoch": round(med, 3),
        "ms_per_step": round(1000.0 * med / steps, 2),
        "steps_per_epoch": steps,
    }
    print(f"[probe] K={k}: {row}", flush=True)
    return row


def main():
    os.makedirs(WORK, exist_ok=True)
    base = os.path.join(WORK, "SynthProbe2k")
    if not os.path.exists(os.path.join(base, "split", "train.txt")):
        print("[probe] generating tiny dataset...", flush=True)
        t0 = time.perf_counter()
        generate_dataset(base, num_train=N_TRAIN, num_val=N_VAL, seed=99,
                         vres=16, hres=180)
        print(f"[probe] gen done in {time.perf_counter()-t0:.0f}s", flush=True)

    rows = [run_arm(base, k) for k in (1, 8)]
    out = {
        "backend": jax.devices()[0].platform,
        "date": time.strftime("%Y-%m-%d %H:%M"),
        "shape": f"B{BATCH} N1024 pointnet-flagship, {N_TRAIN} scenes",
        "arms": rows,
        "speedup_k8_vs_k1": round(
            rows[0]["median_s_per_epoch"] / rows[1]["median_s_per_epoch"], 2
        ),
    }
    path = os.path.join(ROOT, "docs", "dispatch_probe_onchip.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
