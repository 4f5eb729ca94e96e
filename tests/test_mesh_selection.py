"""dp/mesh selection + cascade kwargs + packed-cache lock regression tests.

Covers the round-3 self-review fixes:
- choose_dp/balanced_process_devices: under multi-process SPMD the reduced
  mesh must give every process an equal number of dp rows (otherwise
  make_array_from_process_local_data rejects the per-process batch split).
- cascade_stage_kwargs: a cascade stage with its own trust region implies
  gating for that stage.
- PackedDataset: concurrent openers of an uncached dataset dir elect a
  single packer via the lockfile; stale locks (dead owner) are broken.
"""

import os
import threading
import types

import numpy as np
import pytest

from alignnet3d_tpu.parallel import mesh as meshlib
from alignnet3d_tpu.training.trainer import cascade_stage_kwargs


def _fake_devices(counts):
    """counts: {process_index: n_local_devices} -> flat device list."""
    out = []
    for p, n in counts.items():
        for i in range(n):
            out.append(types.SimpleNamespace(process_index=p, id=p * 100 + i))
    return out


class TestChooseDp:
    def test_single_process_divisor(self):
        assert meshlib.choose_dp(8, 12) == 6
        assert meshlib.choose_dp(8, 16) == 8
        assert meshlib.choose_dp(8, 7) == 7
        assert meshlib.choose_dp(3, 7) == 1

    def test_multiprocess_keeps_process_multiple(self):
        # the review scenario: 8 devices, 2 processes, batch 12.
        # dp=6 divides 12 AND is a multiple of 2
        assert meshlib.choose_dp(8, 12, num_processes=2) == 6
        # odd dp values that divide the batch but straddle processes are
        # rejected: dp=7 divides 14 but 7 % 2 != 0
        assert meshlib.choose_dp(8, 14, num_processes=2) == 2

    def test_multiprocess_indivisible_batch_rejected(self):
        # batch 10 cannot split evenly over 4 processes: fail at the
        # selection site, not in make_array_from_process_local_data
        with pytest.raises(AssertionError):
            meshlib.choose_dp(8, 10, num_processes=4)

    def test_multiprocess_exact_fit(self):
        assert meshlib.choose_dp(8, 16, num_processes=2) == 8


class TestBalancedProcessDevices:
    def test_equal_share_per_process(self):
        devs = _fake_devices({0: 4, 1: 4})
        picked = meshlib.balanced_process_devices(devs, dp=6, mp=1,
                                                  num_processes=2)
        assert len(picked) == 6
        per_proc = [sum(1 for d in picked if d.process_index == p)
                    for p in (0, 1)]
        assert per_proc == [3, 3]
        # process-ordered so mp blocks never straddle processes
        assert [d.process_index for d in picked] == [0, 0, 0, 1, 1, 1]

    def test_mp_blocks_within_process(self):
        devs = _fake_devices({0: 4, 1: 4})
        picked = meshlib.balanced_process_devices(devs, dp=2, mp=2,
                                                  num_processes=2)
        assert [d.process_index for d in picked] == [0, 0, 1, 1]

    def test_mp_straddle_rejected(self):
        devs = _fake_devices({0: 4, 1: 4})
        # dp*mp = 6 over 2 processes -> 3 per process, not divisible by mp=2
        with pytest.raises(AssertionError):
            meshlib.balanced_process_devices(devs, dp=3, mp=2,
                                             num_processes=2)

    def test_insufficient_local_devices_rejected(self):
        devs = _fake_devices({0: 4, 1: 1})
        with pytest.raises(AssertionError):
            meshlib.balanced_process_devices(devs, dp=4, mp=1,
                                             num_processes=2)

    def test_mesh_builds_from_selection(self):
        import jax

        devs = list(jax.devices())[:4]
        m = meshlib.make_mesh(dp=2, mp=2, devices=devs)
        assert m.devices.shape == (2, 2)


class TestCascadeStageKwargs:
    def test_trust_region_implies_gate(self):
        kw = cascade_stage_kwargs({}, {"max_dyaw_deg": 5.0})
        assert kw["gate"] is True
        assert kw["gate_max_dyaw_deg"] == 5.0

    def test_radius_alone_does_not_gate(self):
        kw = cascade_stage_kwargs({}, {"radius": 0.2})
        assert "gate" not in kw
        assert kw["radius"] == 0.2

    def test_base_kwargs_not_mutated(self):
        base = {"gate": True, "gate_max_dxy": 0.5}
        kw = cascade_stage_kwargs(base, {"max_dxy": 0.1})
        assert base["gate_max_dxy"] == 0.5
        assert kw["gate_max_dxy"] == 0.1


class TestPackedCacheLock:
    def test_concurrent_openers_single_packer(self, tmp_path):
        from alignnet3d_tpu.data import provider
        from alignnet3d_tpu.data.synthetic import generate_dataset

        base = str(tmp_path / "ds")
        generate_dataset(base, num_train=6, num_val=2, seed=0)
        results, errs = [], []

        def opener():
            try:
                ds = provider.PackedDataset(base)
                results.append(len(ds.indices))
            except Exception as e:  # noqa: BLE001
                errs.append(e)

        threads = [threading.Thread(target=opener) for _ in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errs, errs
        assert results == [8, 8, 8]
        assert not os.path.exists(
            os.path.join(base, "packed_v2.npz.lock")
        )

    def test_stale_lock_is_broken(self, tmp_path):
        from alignnet3d_tpu.data import provider
        from alignnet3d_tpu.data.synthetic import generate_dataset

        base = str(tmp_path / "ds")
        generate_dataset(base, num_train=6, num_val=2, seed=0)
        meta = os.path.join(base, "packed_v2.npz")
        # a lock owned by a dead pid must not block the opener
        with open(meta + ".lock", "w") as fh:
            fh.write("999999999")
        ds = provider.PackedDataset(base)
        assert len(ds.indices) == 8
        assert not os.path.exists(meta + ".lock")
