"""One process of a multi-host training job (pod-scale dry run worker).

Invoked by ``__graft_entry__.dryrun_multihost`` (and usable manually):

    python scripts/multihost_worker.py --config CFG --proc_id I \
        --num_procs P --coordinator localhost:PORT --local_devices K

Forces K virtual CPU devices, joins the jax.distributed job, then runs
the ordinary CLI train path — the Trainer discovers the multi-process
topology itself (parallel/multihost.py).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--proc_id", type=int, required=True)
    p.add_argument("--num_procs", type=int, required=True)
    p.add_argument("--coordinator", required=True)
    p.add_argument("--local_devices", type=int, default=2)
    args = p.parse_args()

    # pin the EXACT device count: an inherited XLA_FLAGS (e.g. the test
    # suite's 8-device mesh) would otherwise win, because force_cpu only
    # raises an existing count, never lowers it
    import re

    flags = os.environ.get("XLA_FLAGS", "")
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "", flags)
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count="
        f"{args.local_devices}"
    ).strip()

    from alignnet3d_tpu.utils import force_cpu

    force_cpu()

    from alignnet3d_tpu.parallel import multihost

    assert multihost.maybe_initialize(
        coordinator=args.coordinator,
        num_processes=args.num_procs,
        process_id=args.proc_id,
    )

    import jax

    assert jax.process_count() == args.num_procs

    from alignnet3d_tpu.cli import main as cli_main

    cli_main(["train", "--config", args.config])
    print(f"multihost worker {args.proc_id}/{args.num_procs} ok", flush=True)


if __name__ == "__main__":
    main()
