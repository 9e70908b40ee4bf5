"""Dataset reader tests: CDR round-trip against hand-encoded messages in a
synthetic rosbag2 sqlite file, and EuRoC folder parsing."""

import os
import sqlite3
import struct

import numpy as np

from lvislam_tpu.utils import bag


def cdr_writer():
    out = bytearray(b"\x00\x01\x00\x00")

    def align(n):
        rem = (len(out) - 4) % n
        if rem:
            out.extend(b"\x00" * (n - rem))

    def u8(v): out.append(v)
    def u16(v): align(2); out.extend(struct.pack("<H", v))
    def u32(v): align(4); out.extend(struct.pack("<I", v))
    def i32(v): align(4); out.extend(struct.pack("<i", v))
    def u64(v): align(8); out.extend(struct.pack("<Q", v))
    def f32(v): align(4); out.extend(struct.pack("<f", v))
    def f64(v): align(8); out.extend(struct.pack("<d", v))
    def string(s):
        b = s.encode() + b"\x00"
        u32(len(b))
        out.extend(b)
    def raw(b): out.extend(b)
    return out, locals()


def encode_imu(stamp, gyro, acc):
    out, w = cdr_writer()
    w["i32"](int(stamp))
    w["u32"](int((stamp % 1) * 1e9))
    w["string"]("imu")
    for v in [0.0, 0.0, 0.0, 1.0]:
        w["f64"](v)
    for _ in range(9):
        w["f64"](0.0)
    for v in gyro:
        w["f64"](v)
    for _ in range(9):
        w["f64"](0.0)
    for v in acc:
        w["f64"](v)
    for _ in range(9):
        w["f64"](0.0)
    return bytes(out)


def encode_livox(stamp, xyz, rings):
    out, w = cdr_writer()
    w["i32"](int(stamp))
    w["u32"](int((stamp % 1) * 1e9))
    w["string"]("livox_frame")
    w["u64"](123456789)
    w["u32"](len(xyz))
    w["u8"](0)
    for _ in range(3):
        w["u8"](0)
    w["u32"](len(xyz))
    for i, p in enumerate(xyz):
        w["u32"](i * 1000)
        for v in p:
            w["f32"](v)
        w["u8"](100)
        w["u8"](0)
        w["u8"](int(rings[i]))
    return bytes(out)


def test_rosbag2_roundtrip(tmp_path):
    db = str(tmp_path / "test.db3")
    conn = sqlite3.connect(db)
    conn.execute("CREATE TABLE topics(id INTEGER PRIMARY KEY, name TEXT, type TEXT, "
                 "serialization_format TEXT, offered_qos_profiles TEXT)")
    conn.execute("CREATE TABLE messages(id INTEGER PRIMARY KEY, topic_id INTEGER, "
                 "timestamp INTEGER, data BLOB)")
    conn.execute("INSERT INTO topics VALUES (1, '/livox/imu', 'sensor_msgs/msg/Imu', 'cdr', '')")
    conn.execute("INSERT INTO topics VALUES (2, '/livox/lidar', "
                 "'livox_ros_driver2/msg/CustomMsg', 'cdr', '')")
    gyro = [0.1, -0.2, 0.3]
    acc = [0.5, 9.8, -0.1]
    conn.execute("INSERT INTO messages VALUES (1, 1, 1000000000, ?)",
                 (encode_imu(1.0, gyro, acc),))
    xyz = np.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]], np.float32)
    conn.execute("INSERT INTO messages VALUES (2, 2, 1050000000, ?)",
                 (encode_livox(1.05, xyz, [0, 2]),))
    conn.commit()
    conn.close()

    msgs = list(bag.Rosbag2Reader(db))
    assert len(msgs) == 2
    t0, name0, kind0, m0 = msgs[0]
    assert kind0 == "imu" and abs(t0 - 1.0) < 1e-9
    np.testing.assert_allclose(m0["gyro"], gyro)
    np.testing.assert_allclose(m0["acc"], acc)
    t1, name1, kind1, m1 = msgs[1]
    assert kind1 == "livox"
    np.testing.assert_allclose(m1["xyz"], xyz)
    np.testing.assert_array_equal(m1["ring"], [0, 2])
    np.testing.assert_allclose(m1["time"], [0.0, 1e-6], atol=1e-12)


def encode_pointcloud2(stamp, fields, point_blob, point_step, n):
    """fields: [(name, offset, datatype_code, count)]"""
    out, w = cdr_writer()
    w["i32"](int(stamp))
    w["u32"](int((stamp % 1) * 1e9))
    w["string"]("lidar")
    w["u32"](1)  # height
    w["u32"](n)  # width
    w["u32"](len(fields))
    for name, off, code, cnt in fields:
        w["string"](name)
        w["u32"](off)
        w["u8"](code)
        w["u32"](cnt)
    w["u8"](0)  # bigendian
    w["u32"](point_step)
    w["u32"](point_step * n)
    w["u32"](len(point_blob))
    w["raw"](point_blob)
    w["u8"](1)  # is_dense
    return bytes(out)


def test_pointcloud2_fast_layout():
    """x,y,z,intensity f32 + ring u16 + time f32 -> native decoder path;
    the NaN point must be compacted out."""
    n = 4
    step = 24
    blob = bytearray(step * n)
    xyz = np.array([[1, 2, 3], [np.nan, 0, 0], [4, 5, 6], [7, 8, 9]],
                   np.float32)
    for i in range(n):
        struct.pack_into("<ffff", blob, i * step, *xyz[i], float(i) * 10)
        struct.pack_into("<H", blob, i * step + 16, i % 3)
        struct.pack_into("<f", blob, i * step + 18, i * 1e-3)
    f32c, u16c = 7, 4
    msg_bytes = encode_pointcloud2(
        2.0, [("x", 0, f32c, 1), ("y", 4, f32c, 1), ("z", 8, f32c, 1),
              ("intensity", 12, f32c, 1), ("ring", 16, u16c, 1),
              ("time", 18, f32c, 1)],
        bytes(blob), step, n)
    msg = bag.parse_pointcloud2(msg_bytes)
    scan = bag.pointcloud2_to_scan(msg)
    np.testing.assert_allclose(scan["xyz"], xyz[[0, 2, 3]])
    np.testing.assert_allclose(scan["intensity"], [0.0, 20.0, 30.0])
    np.testing.assert_array_equal(scan["ring"], [0, 2, 0])
    np.testing.assert_allclose(scan["time"], [0.0, 2e-3, 3e-3], atol=1e-9)


def test_pointcloud2_generic_layout():
    """Ouster-style layout: u32 nanosecond `t` + u8 `line` -> generic path."""
    n = 3
    step = 18
    blob = bytearray(step * n)
    xyz = np.array([[1, 2, 3], [4, 5, 6], [7, 8, 9]], np.float32)
    for i in range(n):
        struct.pack_into("<fff", blob, i * step, *xyz[i])
        struct.pack_into("<I", blob, i * step + 12, i * 1000)
        blob[i * step + 16] = i  # line
    f32c, u32c, u8c = 7, 6, 2
    msg_bytes = encode_pointcloud2(
        2.0, [("x", 0, f32c, 1), ("y", 4, f32c, 1), ("z", 8, f32c, 1),
              ("t", 12, u32c, 1), ("line", 16, u8c, 1)],
        bytes(blob), step, n)
    scan = bag.pointcloud2_to_scan(bag.parse_pointcloud2(msg_bytes))
    np.testing.assert_allclose(scan["xyz"], xyz)
    np.testing.assert_array_equal(scan["ring"], [0, 1, 2])
    np.testing.assert_allclose(scan["time"], [0.0, 1e-6, 2e-6], atol=1e-12)


def test_euroc_reader(tmp_path):
    root = tmp_path / "mav0"
    os.makedirs(root / "imu0")
    os.makedirs(root / "cam0" / "data")
    with open(root / "imu0" / "data.csv", "w") as f:
        f.write("#ts,gx,gy,gz,ax,ay,az\n")
        f.write("1000000000,0.1,0.2,0.3,1,2,9.8\n")
        f.write("1005000000,0.1,0.2,0.3,1,2,9.8\n")
    from PIL import Image
    img = Image.fromarray((np.random.default_rng(0).random((24, 32)) * 255).astype(np.uint8))
    img.save(root / "cam0" / "data" / "1002000000.png")
    with open(root / "cam0" / "data.csv", "w") as f:
        f.write("#ts,filename\n1002000000,1002000000.png\n")
    msgs = list(bag.euroc_reader(str(root)))
    kinds = [m[2] for m in msgs]
    assert kinds == ["imu", "image", "imu"]
    assert msgs[1][3]["image"].shape == (24, 32)
