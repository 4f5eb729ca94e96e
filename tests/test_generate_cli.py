"""Dataset-generation CLI: variant semantics."""

import json

from alignnet3d_tpu.data.generate import main


def test_synthcars_variant(tmp_path):
    out = str(tmp_path / "SC")
    main(["SynthCars", "--out", out, "--num_train", "3", "--num_val", "2",
          "--vres", "12", "--hres", "90"])
    metas = [json.load(open(f"{out}/meta/{i:08d}.json")) for i in range(5)]
    assert all(m["cat"] == "car" for m in metas)
    assert all(1 <= m["mesh_id"] <= 53 for m in metas)


def test_second_object_set_variant(tmp_path):
    out = str(tmp_path / "S2O")
    main(["Synth20others", "--out", out, "--num_train", "3", "--num_val",
          "2", "--vres", "12", "--hres", "90", "--seed", "5"])
    metas = [json.load(open(f"{out}/meta/{i:08d}.json")) for i in range(5)]
    assert all(m["mesh_id"] >= 54 for m in metas)


def test_persons_variant(tmp_path):
    out = str(tmp_path / "SCP")
    main(["SynthCarsPersons", "--out", out, "--num_train", "10", "--num_val",
          "2", "--vres", "12", "--hres", "120", "--seed", "9"])
    metas = [json.load(open(f"{out}/meta/{i:08d}.json")) for i in range(12)]
    cats = {m["cat"] for m in metas}
    assert "car" in cats  # persons appear with prob 0.2; cars certain
