"""Native BVH ray-mesh intersector: correctness vs the numpy fallback and
vs the analytic box caster; OFF loader; MeshScene end-to-end."""

import numpy as np
import pytest

from alignnet3d_tpu.data import mesh_raycast as mr
from alignnet3d_tpu.data.synthetic import lidar_rays, ray_box_hits


def _box_mesh(half=(1.0, 1.0, 1.0), center=(0.0, 0.0, 0.0)):
    """12-triangle box mesh."""
    hx, hy, hz = half
    cx, cy, cz = center
    corners = np.array([
        [x, y, z]
        for x in (-hx, hx) for y in (-hy, hy) for z in (-hz, hz)
    ], np.float32) + np.asarray(center, np.float32)
    # faces (two triangles per side), consistent with corner ordering
    quads = [
        (0, 1, 3, 2), (4, 6, 7, 5),  # x- x+
        (0, 4, 5, 1), (2, 3, 7, 6),  # y- y+
        (0, 2, 6, 4), (1, 5, 7, 3),  # z- z+
    ]
    faces = []
    for a, b, c, d in quads:
        faces.append([a, b, c])
        faces.append([a, c, d])
    return corners, np.asarray(faces, np.int32)


def test_native_matches_numpy_fallback(rng):
    verts, faces = _box_mesh(center=(0, 8, 0))
    dirs = lidar_rays(16, 180).astype(np.float32)
    ref = mr._scan_mesh_numpy(verts, faces, dirs, 120.0)
    if mr.get_lib() is None:
        pytest.skip("native raycast unavailable")
    got = mr.scan_mesh(verts, faces, dirs)
    assert len(got) == len(ref)
    np.testing.assert_allclose(
        np.sort(got, axis=0), np.sort(ref, axis=0), atol=1e-4
    )


def test_mesh_box_matches_analytic_box():
    """Scanning a triangulated box must agree with the analytic slab-test
    caster on the same box."""
    verts, faces = _box_mesh(half=(1.0, 2.0, 0.8), center=(0.0, 10.0, 0.0))
    dirs = lidar_rays(24, 360)
    mesh_pts = mr.scan_mesh(verts, faces, dirs.astype(np.float32))
    pose = np.eye(4)
    pose[:3, 3] = [0.0, 10.0, 0.0]
    box_pts = ray_box_hits(dirs, pose, np.array([1.0, 2.0, 0.8]))
    assert abs(len(mesh_pts) - len(box_pts)) <= 2  # edge rays may differ
    # same surface: every mesh hit is on the analytic box surface
    local = mesh_pts - np.array([0, 10.0, 0])
    on_face = np.isclose(np.abs(local), np.array([1.0, 2.0, 0.8]),
                         atol=1e-3).any(axis=1)
    assert on_face.all()


def test_off_loader_roundtrip(tmp_path):
    verts, faces = _box_mesh()
    path = tmp_path / "box.off"
    lines = ["OFF", f"{len(verts)} {len(faces)} 0"]
    lines += [" ".join(f"{v:.6f}" for v in row) for row in verts]
    lines += ["3 " + " ".join(str(i) for i in f) for f in faces]
    path.write_text("\n".join(lines) + "\n")
    v2, f2 = mr.load_off(str(path))
    np.testing.assert_allclose(v2, verts, atol=1e-6)
    np.testing.assert_array_equal(f2, faces)
    # polygon triangulation: a quad face becomes two triangles
    quad_lines = ["OFF", "4 1 0", "0 0 0", "1 0 0", "1 1 0", "0 1 0",
                  "4 0 1 2 3"]
    (tmp_path / "quad.off").write_text("\n".join(quad_lines) + "\n")
    _, fq = mr.load_off(str(tmp_path / "quad.off"))
    assert fq.shape == (2, 3)


def test_mesh_normalization():
    verts, faces = _box_mesh(half=(2.0, 4.0, 1.0), center=(5.0, 5.0, 5.0))
    mesh = mr.Mesh(verts, faces)
    assert np.allclose(
        (mesh.vertices.min(0) + mesh.vertices.max(0)) / 2, 0, atol=1e-6
    )
    assert np.max(np.abs(mesh.vertices)) == pytest.approx(0.5, abs=1e-6)


def test_mesh_scene_end_to_end(tmp_path):
    verts, faces = _box_mesh()
    mesh = mr.Mesh(verts, faces)
    scene = mr.MeshScene(mesh, seed=3, mesh_scale=6.0, vres=24, hres=360)
    scene.generate_pointcloud()
    assert all(len(pc) > 5 for pc in scene.pointclouds)
    scene.save(str(tmp_path), 0)

    from alignnet3d_tpu.data.provider import load_meta, parse_meta_labels
    from alignnet3d_tpu.geometry import get_mat_angle, transform_points

    meta = load_meta(str(tmp_path), 0)
    t, ra, c1, c2, a1, a2 = parse_meta_labels(meta)
    pc1 = np.load(tmp_path / "pointcloud1" / "00000000.npy")
    # points live on the posed normalized mesh (max extent 3 = scale/2)
    local = transform_points(pc1, np.linalg.inv(get_mat_angle(c1, a1)))
    assert np.max(np.abs(local)) < 3.0 + 0.06


def test_procedural_car_mesh_watertight_scan():
    """The procedural car library (reference's ModelNet stand-in) builds
    closed prisms that the raycaster sees from every side."""
    import numpy as np
    from alignnet3d_tpu.data.mesh_raycast import (
        Mesh, procedural_car_mesh, scan_mesh, lidar_rays,
    )

    rng = np.random.default_rng(7)
    v, f = procedural_car_mesh(rng)
    assert v.shape[1] == 3 and f.shape[1] == 3
    assert f.max() < len(v)
    m = Mesh(v, f)
    for yaw in (0.0, np.pi / 2, np.pi, -np.pi / 3):
        c, s = np.cos(yaw), np.sin(yaw)
        pose = np.eye(4)
        pose[:2, :2] = [[c, -s], [s, c]]
        pose[:3, 3] = [8.0, 0.0, 0.0]
        pts = scan_mesh(m.posed(4.5, pose), m.faces, lidar_rays(32, 720))
        assert len(pts) > 50, yaw
        # hits lie on the object, not behind it
        assert np.all(np.linalg.norm(pts, axis=1) < 12.0)


def test_generate_mesh_dataset_roundtrip(tmp_path):
    import numpy as np
    from alignnet3d_tpu.data.mesh_raycast import generate_mesh_dataset
    from alignnet3d_tpu.data import provider

    train, val = generate_mesh_dataset(
        str(tmp_path), num_train=3, num_val=2, seed=1, vres=16, hres=360,
        library_size=4,
    )
    assert len(train) == 3 and len(val) == 2
    ds = provider.PackedDataset(str(tmp_path))
    rows = ds.rows(train + val)
    assert (ds.counts1[rows] > 0).all()
    # meta round-trips through the reference codec
    metas = ds.metas(train)
    assert "rel_angle" in metas[0] and metas[0]["mesh_id"] < 4
