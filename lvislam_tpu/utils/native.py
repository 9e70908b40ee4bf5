"""ctypes bindings for the native host data plane (`native/src/
lvislam_native.cpp`). Builds on demand with the in-tree Makefile; every
entry point has a NumPy fallback so the framework stays importable without
a toolchain."""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "liblvislam_native.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    i32, i64, f32p = ctypes.c_int32, ctypes.c_int64, np.ctypeslib.ndpointer(np.float32)
    u8p = np.ctypeslib.ndpointer(np.uint8)
    i32p = np.ctypeslib.ndpointer(np.int32)
    f64p = np.ctypeslib.ndpointer(np.float64)
    lib.decode_pointcloud2.restype = ctypes.c_int
    lib.decode_pointcloud2.argtypes = [
        u8p, i64, i32, i32, i32, i32, i32, i32, i32, i32, i64,
        f32p, f32p, i32p, f32p, u8p,
    ]
    lib.imu_window.restype = ctypes.c_int
    lib.imu_window.argtypes = [
        f64p, f32p, f32p, i64, ctypes.c_double, ctypes.c_double, i64,
        f32p, f32p, f32p,
    ]
    lib.voxel_prefilter.restype = ctypes.c_int
    lib.voxel_prefilter.argtypes = [f32p, u8p, i64, ctypes.c_float, i64, f32p, u8p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def decode_pointcloud2(
    data: bytes, n_points: int, point_step: int,
    offsets: dict, capacity: int, ring_is_uint8: bool = False,
):
    """Decode a packed point blob -> (xyz, intensity, ring, time, valid).
    `offsets`: {'x':0,'y':4,'z':8,'intensity':12,'ring':16,'time':18}; use
    -1 for absent fields."""
    lib = _load()
    xyz = np.zeros((capacity, 3), np.float32)
    inten = np.zeros(capacity, np.float32)
    ring = np.zeros(capacity, np.int32)
    time = np.zeros(capacity, np.float32)
    valid = np.zeros(capacity, np.uint8)
    buf = np.frombuffer(data, dtype=np.uint8)
    if lib is not None:
        lib.decode_pointcloud2(
            buf, n_points, point_step,
            offsets.get("x", 0), offsets.get("y", 4), offsets.get("z", 8),
            offsets.get("intensity", -1), offsets.get("ring", -1),
            offsets.get("time", -1), int(ring_is_uint8), capacity,
            xyz, inten, ring, time, valid,
        )
        return xyz, inten, ring, time, valid.astype(bool)
    # numpy fallback
    n = min(n_points, capacity)
    raw = buf[: n_points * point_step].reshape(n_points, point_step)

    def f32(off):
        return raw[:, off:off + 4].copy().view(np.float32)[:, 0]

    x, y, z = f32(offsets["x"]), f32(offsets["y"]), f32(offsets["z"])
    ok = np.isfinite(x) & np.isfinite(y) & np.isfinite(z)
    idx = np.nonzero(ok)[0][:capacity]
    m = len(idx)
    xyz[:m] = np.stack([x[idx], y[idx], z[idx]], -1)
    if offsets.get("intensity", -1) >= 0:
        inten[:m] = f32(offsets["intensity"])[idx]
    if offsets.get("ring", -1) >= 0:
        off = offsets["ring"]
        if ring_is_uint8:
            ring[:m] = raw[idx, off]
        else:
            ring[:m] = raw[:, off:off + 2].copy().view(np.uint16)[:, 0][idx]
    if offsets.get("time", -1) >= 0:
        time[:m] = f32(offsets["time"])[idx]
    valid[:m] = 1
    return xyz, inten, ring, time, valid.astype(bool)


def imu_window(stamps, gyro, acc, t0: float, t1: float, capacity: int):
    """Padded IMU window in (t0, t1] -> (dts, acc, gyro, n)."""
    lib = _load()
    stamps = np.ascontiguousarray(stamps, np.float64)
    gyro = np.ascontiguousarray(gyro, np.float32)
    acc = np.ascontiguousarray(acc, np.float32)
    dts = np.zeros(capacity, np.float32)
    acc_o = np.zeros((capacity, 3), np.float32)
    gyr_o = np.zeros((capacity, 3), np.float32)
    if lib is not None:
        n = lib.imu_window(stamps, gyro, acc, len(stamps), t0, t1, capacity,
                           dts, acc_o, gyr_o)
        return dts, acc_o, gyr_o, n
    sel = np.nonzero((stamps > t0) & (stamps <= t1))[0][:capacity]
    n = len(sel)
    if n:
        dts[:n] = np.diff(stamps[sel], prepend=t0)
        acc_o[:n] = acc[sel]
        gyr_o[:n] = gyro[sel]
        acc_o[n:] = acc_o[n - 1]
        gyr_o[n:] = gyr_o[n - 1]
    return dts, acc_o, gyr_o, n


def voxel_prefilter(xyz, valid, leaf: float, capacity: int):
    lib = _load()
    xyz = np.ascontiguousarray(xyz, np.float32)
    valid = np.ascontiguousarray(valid, np.uint8)
    out = np.zeros((capacity, 3), np.float32)
    vout = np.zeros(capacity, np.uint8)
    if lib is not None:
        lib.voxel_prefilter(xyz, valid, len(xyz), leaf, capacity, out, vout)
        return out, vout.astype(bool)
    # numpy fallback: first point per voxel
    keys = np.floor(xyz / leaf).astype(np.int64)
    key = (keys[:, 0] << 42) ^ (keys[:, 1] << 21) ^ keys[:, 2]
    key[~valid.astype(bool)] = np.iinfo(np.int64).max
    _, first = np.unique(key, return_index=True)
    first = np.sort(first[key[first] != np.iinfo(np.int64).max])[:capacity]
    out[: len(first)] = xyz[first]
    vout[: len(first)] = 1
    return out, vout.astype(bool)
