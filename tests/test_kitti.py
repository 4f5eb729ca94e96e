"""KITTI toolbox tests: calibration round-trips, label parsing with track
re-splitting, box extraction, relative-transform derivation."""

import numpy as np
import pytest

from alignnet3d_tpu.data import kitti
from alignnet3d_tpu.geometry import transform_points


@pytest.fixture
def calib(tmp_path):
    # simple but non-trivial calibration
    p = tmp_path / "0000.txt"
    p.write_text(
        "P2: 700 0 600 40 0 700 180 2 0 0 1 0\n"
        "R_rect: 0.9999 0.01 0 -0.01 0.9999 0 0 0 1\n"
        "Tr_velo_cam: 0 -1 0 0.05 0 0 -1 -0.05 1 0 0 -0.27\n"
    )
    return kitti.Calibration(str(p))


def test_calib_velo_rect_roundtrip(calib, rng):
    pts = rng.normal(size=(50, 3)) * 10 + np.array([15, 0, 0])
    rect = calib.project_velo_to_rect(pts)
    back = calib.project_rect_to_velo(rect)
    np.testing.assert_allclose(back, pts, atol=1e-9)


def test_calib_image_projection_roundtrip(calib, rng):
    # points in front of the camera
    rect = np.abs(rng.normal(size=(20, 3))) * np.array([2, 1, 0]) + \
        np.array([0, 0, 10.0])
    uv = calib.project_rect_to_image(rect)
    uvd = np.concatenate([uv, rect[:, 2:3]], axis=1)
    back = calib.project_image_to_rect(uvd)
    np.testing.assert_allclose(back, rect, atol=1e-6)


def test_calib_key_aliases(tmp_path):
    p = tmp_path / "c.txt"
    p.write_text(
        "P2: 700 0 600 0 0 700 180 0 0 0 1 0\n"
        "R0_rect: 1 0 0 0 1 0 0 0 1\n"
        "Tr_velo_to_cam: 0 -1 0 0 0 0 -1 0 1 0 0 0\n"
    )
    c = kitti.Calibration(str(p))
    np.testing.assert_allclose(c.R0, np.eye(3))


LABELS = """0 0 Car 0 0 -1.5 100 100 200 200 1.5 1.6 4.0 2.0 1.6 8.0 0.2
0 1 DontCare 0 0 0 0 0 10 10 1 1 1 0 0 5 0
1 0 Car 0 0 -1.5 100 100 200 200 1.5 1.6 4.0 2.1 1.6 8.2 0.25
2 0 Car 0 0 -1.5 100 100 200 200 1.5 1.6 4.0 2.2 1.6 8.4 0.3
4 0 Car 0 0 -1.5 100 100 200 200 1.5 1.6 4.0 2.4 1.6 8.8 0.4
0 7 Pedestrian 0 3 0 0 0 10 10 1.8 0.6 0.6 -2 1.6 6 0
0 9 Car 0 4 0 0 0 10 10 1.5 1.6 4.0 5 1.6 9 0
"""


def test_tracking_labels_parse_filter_resplit(tmp_path):
    path = tmp_path / "0000.txt"
    path.write_text(LABELS)
    labels = kitti.TrackingLabels(str(path))
    # DontCare removed, occluded=4 filtered (threshold 3)
    classes = {r["class"] for r in labels.rows}
    assert "DontCare" not in classes
    assert all(r["occluded"] <= 3 for r in labels.rows)
    # ids remapped to 0-based contiguous: Car(0)->0, Pedestrian(7)->1
    assert 0 in labels.ids and 1 in labels.ids
    # Car track has a gap (frame 3 missing) -> resplit: frame-4 row gets a
    # new id
    car_rows = sorted(
        (r for r in labels.rows if r["class"] == "Car"),
        key=lambda r: r["frame"],
    )
    assert car_rows[-1]["frame"] == 4
    assert car_rows[-1]["id"] != car_rows[0]["id"]
    assert car_rows[1]["id"] == car_rows[0]["id"]


def test_box_corners_and_containment():
    boxvec = np.array([2.0, 1.0, 10.0, 1.5, 1.6, 4.0, 0.3])
    corners = kitti.compute_box_3d(boxvec)
    assert corners.shape == (8, 3)
    # box center (y at bottom -> center is y - h/2)
    center = np.array([2.0, 1.0 - 0.75, 10.0])
    np.testing.assert_allclose(corners.mean(axis=0), center, atol=1e-9)
    # containment: center inside, corner+eps outside
    assert kitti.points_in_box_3d(center[None], boxvec)[0]
    outside = center + np.array([0, 0, 3.0])
    assert not kitti.points_in_box_3d(outside[None], boxvec)[0]
    # all corners are inside (boundary)
    assert kitti.points_in_box_3d(corners, boxvec).all()


def test_extract_object_points_roundtrip(rng):
    """Points generated inside a box in rect coords must survive the
    velo->rect->global extraction pipeline."""
    boxvec = np.array([1.0, 1.5, 12.0, 1.5, 1.6, 4.0, 0.5])
    R = kitti.roty(boxvec[6])
    local = rng.uniform(-0.45, 0.45, (100, 3)) * np.array([4.0, 1.5, 1.6])
    center_rect = boxvec[:3] + R @ np.array([0, -boxvec[3] / 2, 0])
    pts_rect = local @ R.T + center_rect
    # to velodyne coords via the nominal inverse (rect->velo = @ R_k2g ... )
    pts_velo = pts_rect @ kitti.R_KITTI2GLOBAL  # inverse of @ R.T
    scan = np.concatenate([pts_velo, np.ones((100, 1))], axis=1)
    out = kitti.extract_object_points(scan, boxvec)
    assert len(out) == 100
    # output is in the global frame: matches pts_rect @ R_KITTI2GLOBAL
    np.testing.assert_allclose(out, pts_rect @ kitti.R_KITTI2GLOBAL, atol=1e-9)


def test_relative_transform_consistency():
    """get_mat_angle(translation, angle, center) must map the global pose-1
    position to the pose-2 position (z aside)."""
    box1 = np.array([2.0, 1.0, 8.0, 1.5, 1.6, 4.0, 0.2])
    box2 = np.array([2.5, 1.0, 8.5, 1.5, 1.6, 4.0, 0.35])
    mat, translation, angle, center, zdiff = kitti.get_relative_transform(
        box1, box2
    )
    assert angle == pytest.approx(0.15)
    c1_global = box1[:3] @ kitti.R_KITTI2GLOBAL
    c2_global = box2[:3] @ kitti.R_KITTI2GLOBAL
    moved = transform_points(c1_global[None], mat)[0]
    # translation was z-zeroed; compare xy exactly, z via zdiff
    np.testing.assert_allclose(moved[:2], c2_global[:2], atol=1e-9)
    assert moved[2] + zdiff == pytest.approx(c2_global[2])


def test_from_kitti_scene_writes_compatible_meta(tmp_path, rng):
    row1 = {"frame": 3, "id": 4, "class": "Car", "truncated": 0.0,
            "occluded": 0.0, "x": 2.0, "y": 1.0, "z": 8.0, "xd": 1.5,
            "yd": 1.6, "zd": 4.0, "roty": 0.2}
    row2 = dict(row1, frame=4, x=2.2, z=8.3, roty=0.3)
    pc1 = rng.normal(size=(50, 3))
    pc2 = rng.normal(size=(60, 3))
    scene = kitti.FromKITTIScene(row1, row2, pc1, pc2, seq=7)
    scene.save(str(tmp_path), 0)

    from alignnet3d_tpu.data.provider import load_meta, parse_meta_labels

    meta = load_meta(str(tmp_path), 0)
    t, ra, c1, c2, a1, a2 = parse_meta_labels(meta)
    assert meta["seq"] == 7
    assert meta["trackids"] == [4, 4]
    assert ra == pytest.approx(0.1)
    assert t[2] == 0.0  # ground-plane constrained
    saved_pc2 = np.load(tmp_path / "pointcloud2" / "00000000.npy")
    assert saved_pc2.shape == (60, 3)


def test_calib_from_video_dir(tmp_path):
    (tmp_path / "calib_cam_to_cam.txt").write_text(
        "R_rect_00: 1 0 0 0 1 0 0 0 1\n"
        "P_rect_02: 700 0 600 0 0 700 180 0 0 0 1 0\n"
    )
    (tmp_path / "calib_velo_to_cam.txt").write_text(
        "R: 0 -1 0 0 0 -1 1 0 0\nT: 0.1 -0.05 -0.27\n"
    )
    c = kitti.Calibration.from_video_dir(str(tmp_path))
    assert c.V2C.shape == (3, 4)
    np.testing.assert_allclose(c.V2C[:, 3], [0.1, -0.05, -0.27])


def test_extract_colors_for_points(tmp_path):
    p = tmp_path / "c.txt"
    p.write_text(
        "P2: 100 0 50 0 0 100 50 0 0 0 1 0\n"
        "R0_rect: 1 0 0 0 1 0 0 0 1\n"
        "Tr_velo_to_cam: 0 -1 0 0 0 0 -1 0 1 0 0 0\n"
    )
    calib = kitti.Calibration(str(p))
    image = np.zeros((100, 100, 3))
    image[50, 50] = [255.0, 0.0, 0.0]
    # a point straight ahead in rect coords (0,0,z) projects to (50,50)
    pt_rect = np.array([[0.0, 0.0, 10.0]])
    pt_global = pt_rect @ kitti.R_KITTI2GLOBAL
    colors = kitti.extract_colors_for_points(pt_global, calib, image)
    np.testing.assert_allclose(colors[0], [255.0, 0, 0])
    # behind the camera -> zero color
    behind = (-pt_rect) @ kitti.R_KITTI2GLOBAL
    colors2 = kitti.extract_colors_for_points(behind, calib, image)
    np.testing.assert_allclose(colors2[0], 0.0)
