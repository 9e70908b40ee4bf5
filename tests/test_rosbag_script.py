"""Unit coverage for the rosbag replay entry point's PointCloud2 decoding
(now `utils.bag.pointcloud2_to_scan`, consumed by scripts/run_rosbag_lvi.py)
— full-system replay is covered by test_lvi_system on synthetic streams."""

import numpy as np

from lvislam_tpu.utils import bag


def make_pc2(xyz, inten, ring, t):
    """Pack a Velodyne-style x,y,z,intensity,ring,time record payload."""
    n = len(xyz)
    step = 22  # 4*4 + 2 + 4
    rec = np.zeros((n, step), np.uint8)
    rec[:, 0:4] = np.asarray(xyz[:, 0], np.float32)[:, None].view(np.uint8)
    rec[:, 4:8] = np.asarray(xyz[:, 1], np.float32)[:, None].view(np.uint8)
    rec[:, 8:12] = np.asarray(xyz[:, 2], np.float32)[:, None].view(np.uint8)
    rec[:, 12:16] = np.asarray(inten, np.float32)[:, None].view(np.uint8)
    rec[:, 16:18] = np.asarray(ring, np.uint16)[:, None].view(np.uint8)
    rec[:, 18:22] = np.asarray(t, np.float32)[:, None].view(np.uint8)
    fields = {"x": (0, 7, 1), "y": (4, 7, 1), "z": (8, 7, 1),
              "intensity": (12, 7, 1), "ring": (16, 4, 1), "time": (18, 7, 1)}
    return dict(stamp=0.0, frame="velo", height=1, width=n, fields=fields,
                point_step=step, data=rec.tobytes())


def test_pc2_to_scan_velodyne_layout():
    xyz = np.array([[1, 2, 3], [4, 5, 6], [-1, 0, 2]], np.float32)
    inten = np.array([10, 20, 30], np.float32)
    ring = np.array([0, 7, 15], np.uint16)
    t = np.array([0.0, 0.05, 0.099], np.float32)
    scan = bag.pointcloud2_to_scan(make_pc2(xyz, inten, ring, t))
    np.testing.assert_allclose(scan["xyz"], xyz)
    np.testing.assert_allclose(scan["intensity"], inten)
    np.testing.assert_array_equal(scan["ring"], [0, 7, 15])
    np.testing.assert_allclose(scan["time"], t)


def test_pc2_to_scan_missing_optional_fields():
    xyz = np.array([[1, 2, 3]], np.float32)
    msg = make_pc2(xyz, [5.0], [3], [0.01])
    msg["fields"] = {k: v for k, v in msg["fields"].items()
                     if k in ("x", "y", "z")}
    scan = bag.pointcloud2_to_scan(msg)
    np.testing.assert_allclose(scan["xyz"], xyz)
    assert scan["ring"].tolist() == [0] and scan["time"].tolist() == [0.0]
