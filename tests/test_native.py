"""Native host data plane: C++ vs NumPy fallback equivalence."""

import numpy as np
import pytest

from lvislam_tpu.utils import native


def make_blob(n=100, step=20, seed=0):
    rng = np.random.default_rng(seed)
    raw = np.zeros((n, step), np.uint8)
    xyz = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    xyz[5] = np.nan  # one invalid point
    inten = rng.uniform(0, 255, n).astype(np.float32)
    ring = rng.integers(0, 4, n).astype(np.uint16)
    t = rng.uniform(0, 0.1, n).astype(np.float32)
    raw[:, 0:12] = xyz.view(np.uint8).reshape(n, 12)
    raw[:, 12:16] = inten[:, None].view(np.uint8)
    raw[:, 16:18] = ring[:, None].view(np.uint8)
    # time at offset 18 would straddle; place nothing (absent)
    return raw.tobytes(), xyz, inten, ring


def test_native_builds_and_decodes():
    assert native.available(), "native lib failed to build"
    blob, xyz, inten, ring = make_blob()
    offs = dict(x=0, y=4, z=8, intensity=12, ring=16, time=-1)
    out = native.decode_pointcloud2(blob, 100, 20, offs, capacity=128)
    oxyz, ointen, oring, otime, ovalid = out
    assert ovalid.sum() == 99  # NaN row dropped
    good = np.nonzero(np.isfinite(xyz[:, 0]))[0]
    np.testing.assert_allclose(oxyz[:99], xyz[good], atol=0)
    np.testing.assert_allclose(ointen[:99], inten[good], atol=0)
    np.testing.assert_array_equal(oring[:99], ring[good])


def test_decode_matches_numpy_fallback():
    blob, *_ = make_blob(seed=3)
    offs = dict(x=0, y=4, z=8, intensity=12, ring=16, time=-1)
    a = native.decode_pointcloud2(blob, 100, 20, offs, capacity=128)
    # force fallback
    lib, native._lib = native._lib, None
    orig_load = native._load
    native._load = lambda: None
    try:
        b = native.decode_pointcloud2(blob, 100, 20, offs, capacity=128)
    finally:
        native._load = orig_load
        native._lib = lib
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_imu_window_native():
    stamps = np.arange(100) * 0.005
    gyro = np.tile(np.arange(100, dtype=np.float32)[:, None], (1, 3))
    acc = gyro + 1000
    dts, acc_o, gyr_o, n = native.imu_window(stamps, gyro, acc, 0.1, 0.2, 32)
    assert n == 20
    np.testing.assert_allclose(dts[:n].sum(), 0.1, atol=1e-6)
    assert gyr_o[0, 0] == 21  # first sample strictly after t0
    assert (dts[n:] == 0).all()


def test_voxel_prefilter_native():
    rng = np.random.default_rng(0)
    xyz = rng.uniform(-2, 2, (500, 3)).astype(np.float32)
    valid = np.ones(500, np.uint8)
    out, vout = native.voxel_prefilter(xyz, valid, leaf=0.5, capacity=512)
    n = vout.sum()
    assert 0 < n < 500
    # one point per voxel
    keys = {tuple(np.floor(p / 0.5).astype(int)) for p in out[vout]}
    assert len(keys) == n
