#!/usr/bin/env python
"""Generate the committed real-format fixture bag (tests/data/fixture_mid360.db3):
a rosbag2 sqlite file carrying the reference rig's actual wire formats —
livox_ros_driver2/CustomMsg scans, sensor_msgs/Imu at 200 Hz and JPEG
sensor_msgs/CompressedImage frames — rendered from the synthetic world.

This is the workflow of the reference's quick-start bags
(`/root/reference/docs/quick-start.md`: `ros2 bag play` into the live
stack) in a self-contained file small enough to commit; the e2e test
(tests/test_rosbag_e2e.py) replays it through scripts/run_rosbag_lvi.py,
driving the CDR decode -> pipeline path end to end.

Usage: python scripts/make_fixture_bag.py [out.db3] [seconds]
"""
import io
import sqlite3
import struct
import sys

import numpy as np

sys.path.insert(0, ".")


class CdrWriter:
    """XCDR1 little-endian writer (inverse of lvislam_tpu.utils.bag.Cdr)."""

    def __init__(self):
        self.out = bytearray(b"\x00\x01\x00\x00")

    def _align(self, n):
        rem = (len(self.out) - 4) % n
        if rem:
            self.out.extend(b"\x00" * (n - rem))

    def u8(self, v):
        self.out.append(v & 0xFF)

    def _prim(self, fmt, size, v):
        self._align(size)
        self.out.extend(struct.pack("<" + fmt, v))

    def u32(self, v):
        self._prim("I", 4, v)

    def i32(self, v):
        self._prim("i", 4, v)

    def u64(self, v):
        self._prim("Q", 8, v)

    def f32(self, v):
        self._prim("f", 4, float(v))

    def f64(self, v):
        self._prim("d", 8, float(v))

    def string(self, s):
        b = s.encode() + b"\x00"
        self.u32(len(b))
        self.out.extend(b)

    def bytes_seq(self, b):
        self.u32(len(b))
        self.out.extend(b)

    def header(self, stamp, frame):
        self.i32(int(stamp))
        self.u32(int(round((stamp % 1.0) * 1e9)))
        self.string(frame)

    def bytes(self):
        return bytes(self.out)


def encode_imu(stamp, gyro, acc, quat_wxyz=None):
    w = CdrWriter()
    w.header(stamp, "livox_frame")
    q = quat_wxyz if quat_wxyz is not None else (1.0, 0.0, 0.0, 0.0)
    for v in (q[1], q[2], q[3], q[0]):  # x y z w on the wire
        w.f64(v)
    for _ in range(9):
        w.f64(0.0)
    for v in gyro:
        w.f64(v)
    for _ in range(9):
        w.f64(0.0)
    for v in acc:
        w.f64(v)
    for _ in range(9):
        w.f64(0.0)
    return w.bytes()


def encode_livox(stamp, xyz, rel_time_s, ring, intensity):
    """livox_ros_driver2/CustomMsg: CustomPoint = {offset_time u32 (ns),
    x/y/z f32, reflectivity u8, tag u8, line u8} — 19 B payload, 4-aligned
    per element (lvislam_tpu.utils.bag._LIVOX_POINT layout)."""
    w = CdrWriter()
    w.header(stamp, "livox_frame")
    w.u64(int(stamp * 1e9))  # timebase
    n = len(xyz)
    w.u32(n)
    w.u8(0)  # lidar_id
    for _ in range(3):
        w.u8(0)  # rsvd
    w.u32(n)  # points sequence length
    for i in range(n):
        w.u32(int(rel_time_s[i] * 1e9))
        w.f32(xyz[i, 0])
        w.f32(xyz[i, 1])
        w.f32(xyz[i, 2])
        w.u8(int(intensity[i]))
        w.u8(0)  # tag
        w.u8(int(ring[i]))
    return w.bytes()


def encode_compressed_image(stamp, img_u8):
    from PIL import Image as PILImage

    buf = io.BytesIO()
    PILImage.fromarray(img_u8, mode="L").save(buf, format="JPEG", quality=85)
    w = CdrWriter()
    w.header(stamp, "camera")
    w.string("jpeg")
    w.bytes_seq(buf.getvalue())
    return w.bytes()


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "tests/data/fixture_mid360.db3"
    dur = float(sys.argv[2]) if len(sys.argv) > 2 else 6.0

    from scipy.spatial.transform import Rotation as Rsc

    from lvislam_tpu.utils import synthetic as syn

    world = syn.default_world(seed=0)
    traj = syn.figure8_trajectory(scale=3.0, period=30.0)
    rng = np.random.default_rng(3)

    msgs = []  # (stamp_ns, topic_id, blob)

    # IMU @ 200 Hz with orientation (the MID360's internal IMU publishes
    # none; we include it so the 9-axis path is exercised too)
    imu_ts = (np.arange(int(dur * 200)) + 1) / 200.0
    w_all, f_all = traj.imu(imu_ts)
    for i, t in enumerate(imu_ts):
        _, R = traj.pose(np.array([t]))
        q = Rsc.from_matrix(R[0]).as_quat()  # xyzw
        msgs.append((int(t * 1e9), 1, encode_imu(
            t, w_all[i], f_all[i], quat_wxyz=(q[3], q[0], q[1], q[2]))))

    # livox scans @ 10 Hz
    for i in range(int(dur * 10) - 1):
        t = 0.05 + i / 10.0
        scan = syn.simulate_lidar_scan(world, traj, t, n_scan=4,
                                       horizon=900, sweep_time=0.1)
        xyz = np.asarray(scan["xyz"], np.float32)
        rt = np.asarray(scan["time"], np.float32)
        ring = np.asarray(scan["ring"], np.int32)
        keep = np.isfinite(xyz).all(-1)
        idx = np.nonzero(keep)[0]
        if len(idx) > 2400:  # cap size; the decoder handles any count
            idx = idx[rng.permutation(len(idx))[:2400]]
            idx.sort()
        inten = np.clip(rng.uniform(20, 180, len(idx)), 0, 255)
        msgs.append((int(t * 1e9), 2, encode_livox(
            t, xyz[idx], rt[idx], ring[idx], inten)))

    # camera @ 10 Hz, JPEG-compressed
    for i in range(int(dur * 10) - 1):
        t = 0.1 + i / 10.0
        img = syn.render_camera_image(world, traj, t, width=320, height=240,
                                      f=200.0)
        u8 = np.clip(np.round(np.asarray(img) * 255.0), 0, 255).astype(np.uint8)
        msgs.append((int(t * 1e9), 3, encode_compressed_image(t, u8)))

    msgs.sort(key=lambda m: m[0])

    conn = sqlite3.connect(out_path)
    conn.execute("DROP TABLE IF EXISTS topics")
    conn.execute("DROP TABLE IF EXISTS messages")
    conn.execute(
        "CREATE TABLE topics(id INTEGER PRIMARY KEY, name TEXT, type TEXT, "
        "serialization_format TEXT, offered_qos_profiles TEXT)")
    conn.execute(
        "CREATE TABLE messages(id INTEGER PRIMARY KEY, topic_id INTEGER, "
        "timestamp INTEGER, data BLOB)")
    conn.execute("INSERT INTO topics VALUES (1, '/livox/imu', "
                 "'sensor_msgs/msg/Imu', 'cdr', '')")
    conn.execute("INSERT INTO topics VALUES (2, '/livox/lidar', "
                 "'livox_ros_driver2/msg/CustomMsg', 'cdr', '')")
    conn.execute("INSERT INTO topics VALUES (3, '/camera/image', "
                 "'sensor_msgs/msg/CompressedImage', 'cdr', '')")
    for i, (ts, tid, blob) in enumerate(msgs):
        conn.execute("INSERT INTO messages VALUES (?, ?, ?, ?)",
                     (i + 1, tid, ts, blob))
    conn.commit()
    conn.close()
    import os

    print(f"{out_path}: {len(msgs)} messages, "
          f"{os.path.getsize(out_path) / 1e6:.2f} MB")


if __name__ == "__main__":
    main()
