"""IMU->lidar extrinsic rotation — the reference's `imuConverter`
(`lidar_odometry/src/utility.h:315-349`, applied at `imageProjection.cpp:193`
and `imuPreintegration.cpp:482`): every IMU sample is rotated into the lidar
frame (gyro/acc by `extrinsicRot`, the 9-axis attitude composed with
`extrinsicRPY`) before the deskew table, the RPY initial guess, or the
fusion smoother see it.

The test mounts the IMU rotated 90° about z plus a 15° x-tilt (so gravity
moves off the IMU z axis), feeds IMU-frame samples, and requires the
configured rig to reproduce the identity rig's trajectory — while the same
samples with the extrinsic dropped must visibly corrupt the fused state.
"""

import numpy as np
from scipy.spatial.transform import Rotation as Rsc

from lvislam_tpu.models import pipeline as lvi
from lvislam_tpu.models.lio import mapping
from lvislam_tpu.models.lio.pipeline import LioConfig, ext_matrix
from lvislam_tpu.utils import synthetic as syn
from lvislam_tpu.utils.metrics import ate_rmse

# rig: gyro_lidar = R_E @ gyro_imu (extrinsicRot). The attitude channel uses
# q_lidar = q_imu * extQRPY (utility.h:334), i.e. R_wl = R_wi @ extRPY, so a
# rigid rig consistent with R_E has extRPY = R_E^T and R_wi = R_wl @ R_E.
R_E = Rsc.from_euler("zx", [90, 15], degrees=True).as_matrix()
_I9 = (1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0)

CAPS = mapping.LioCaps(
    max_keyframes=64, kf_corner=256, kf_surf=1024, sel_keyframes=16,
    map_corner=4096, map_surf=16384, scan_corner=512, scan_surf=2048,
    max_loops=8, max_gps=8, loop_submap=4096, icp_iters=10,
)


def run(rotated_rig: bool, configured: bool, duration=2.0):
    lio_cfg = LioConfig(
        n_scan=4, horizon=900, point_capacity=4096, caps=CAPS,
        params=mapping.LioParams(
            keyframeAddingDistThreshold=0.3, keyframeAddingAngleThreshold=0.1,
            livox_keyframe_interval=0.5, degeneracyEigenThreshold=25.0,
        ),
        loop_every_n_scans=1000,
        ext_rot=tuple(R_E.flatten()) if configured else _I9,
        ext_rpy=tuple(R_E.T.flatten()) if configured else _I9,
    )
    cfg = lvi.LviConfig(lio=lio_cfg, use_lidar_depth=False,
                        use_loop_detector=False)
    sys_ = lvi.LviSystem(cfg)
    world = syn.default_world(seed=0)
    traj = syn.figure8_trajectory(scale=3.0, period=30.0)
    imu_rate, rate = 200.0, 10.0

    imu_ts = (np.arange(int(duration * imu_rate)) + 1) / imu_rate
    w_all, f_all = traj.imu(imu_ts)
    for i, t in enumerate(imu_ts):
        _, R = traj.pose(np.array([t]))
        R_wl = R[0]
        w, f = w_all[i], f_all[i]
        if rotated_rig:
            w, f = R_E.T @ w, R_E.T @ f          # samples in the IMU frame
            rpy = Rsc.from_matrix(R_wl @ R_E).as_euler("ZYX")[::-1]
        else:
            rpy = Rsc.from_matrix(R_wl).as_euler("ZYX")[::-1]
        sys_.feed_imu(t, w.astype(np.float32), f.astype(np.float32),
                      rpy=np.array(rpy, np.float32))

    for i in range(int(duration * rate) - 1):
        ts = 0.05 + i / rate
        scan = syn.simulate_lidar_scan(world, traj, ts, n_scan=4, horizon=900,
                                       sweep_time=1.0 / rate)
        sys_.feed_lidar(ts, scan)
    sys_.run()

    est = np.stack([x6[3:6] for _, x6 in sys_.trajectory])
    gt = np.stack([traj.pose(np.array([t]))[0][0] for t, _ in sys_.trajectory])
    fused = np.stack([o[1] for o in sys_.lio_odoms])
    return dict(
        ate=ate_rmse(est, gt, align=True),
        est=est,
        # fused smoother vs LIS, both in the map frame (world GT is NOT —
        # the map frame zeroes the first-frame yaw)
        fused_err=float(np.linalg.norm(fused - est, axis=1).max()),
        reset_id=max(o[6] for o in sys_.lio_odoms),
    )


def test_ext_matrix_identity_fastpath():
    assert ext_matrix(_I9) is None
    np.testing.assert_allclose(ext_matrix(tuple(R_E.flatten())), R_E)


def test_rotated_rig_matches_identity_rig():
    ident = run(rotated_rig=False, configured=False)
    rot = run(rotated_rig=True, configured=True)
    assert ident["ate"] < 0.12, ident["ate"]
    assert rot["ate"] < 0.12, rot["ate"]
    # same trajectory up to the float32/int16-quant round trip through the
    # rotation (the gyro is rotated BEFORE the pack quantizer, so the two
    # runs quantize different values — cm-level divergence is expected)
    diff = np.linalg.norm(rot["est"] - ident["est"], axis=1).max()
    assert diff < 0.05, diff
    # the fused smoother (acc path through _on_imu's lidar-frame buffers)
    # stays healthy: no failure resets, fused positions track the LIS
    assert rot["reset_id"] == ident["reset_id"] == 0
    assert rot["fused_err"] < max(2 * ident["fused_err"], 0.1), (
        rot["fused_err"], ident["fused_err"])


def test_dropped_rotation_corrupts_upload():
    """Precise no-op guard: the packed upload of (IMU-frame samples +
    configured extrinsic) must reproduce the identity rig's buffer, and the
    same samples WITHOUT the extrinsic must differ grossly in the deskew
    gyro window and the RPY initial guess — i.e. the conversion actually
    changes what the device sees (`imuConverter` at the imageProjection
    entry, `imageProjection.cpp:193`)."""
    from lvislam_tpu.models.lio.pipeline import pack_scan

    world = syn.default_world(seed=0)
    traj = syn.figure8_trajectory(scale=3.0, period=30.0)
    scan = syn.simulate_lidar_scan(world, traj, 0.05, n_scan=4, horizon=900,
                                   sweep_time=0.1)
    irt = np.arange(0.0, 0.1, 1 / 200.0, dtype=np.float32)
    w, _ = traj.imu(0.05 + irt.astype(np.float64))
    _, R = traj.pose(np.array([0.05]))
    rpy_l = np.asarray(
        Rsc.from_matrix(R[0]).as_euler("ZYX")[::-1], np.float32)
    rpy_i = np.asarray(
        Rsc.from_matrix(R[0] @ R_E).as_euler("ZYX")[::-1], np.float32)

    def mk(configured):
        return LioConfig(
            n_scan=4, horizon=900, point_capacity=4096, caps=CAPS,
            ext_rot=tuple(R_E.flatten()) if configured else _I9,
            ext_rpy=tuple(R_E.T.flatten()) if configured else _I9)

    w32 = w.astype(np.float32)
    w_imu = (w @ R_E).astype(np.float32)  # rows w_l -> R_E^T w_l (IMU frame)
    ref = pack_scan(mk(False), scan, irt, w32, rpy_l)
    ok = pack_scan(mk(True), scan, irt, w_imu, rpy_i)
    bad = pack_scan(mk(False), scan, irt, w_imu, rpy_i)

    P = 4096 * 6
    M = 64
    np.testing.assert_array_equal(ok[:P], ref[:P])  # points untouched
    gyr_ref = ref[P:P + M * 8].view(np.float32).reshape(M, 4)[:, 1:]
    gyr_ok = ok[P:P + M * 8].view(np.float32).reshape(M, 4)[:, 1:]
    gyr_bad = bad[P:P + M * 8].view(np.float32).reshape(M, 4)[:, 1:]
    np.testing.assert_allclose(gyr_ok, gyr_ref, atol=2e-6)
    assert np.abs(gyr_bad - gyr_ref).max() > 0.01  # 90°-wrong gyro frame
    rpy_ref = ref[P + M * 8:].view(np.float32)[1:4]
    rpy_ok = ok[P + M * 8:].view(np.float32)[1:4]
    rpy_bad = bad[P + M * 8:].view(np.float32)[1:4]
    np.testing.assert_allclose(rpy_ok, rpy_ref, atol=1e-5)
    assert np.abs(rpy_bad - rpy_ref).max() > 0.5  # ~90° yaw error


def test_on_imu_lidar_frame_buffers():
    """`LviSystem._on_imu` keeps imuConverter-rotated copies for every LIS
    consumer (`utility.h:315-349` at the imuPreintegration entry)."""
    lio_cfg = LioConfig(ext_rot=tuple(R_E.flatten()),
                        ext_rpy=tuple(R_E.T.flatten()))
    sys_ = lvi.LviSystem(lvi.LviConfig(lio=lio_cfg, use_lidar_depth=False,
                                       use_loop_detector=False))
    g = np.array([0.1, -0.2, 0.3], np.float32)
    a = np.array([0.5, 9.8, -0.4], np.float32)
    sys_._on_imu(0.01, dict(gyro=g, acc=a, rpy=None))
    np.testing.assert_allclose(sys_.imu_gyro_l[0], R_E @ g, rtol=1e-6)
    np.testing.assert_allclose(sys_.imu_acc_l[0], R_E @ a, rtol=1e-6)
    # raw buffers keep the IMU frame (the VIS consumes those)
    np.testing.assert_array_equal(sys_.imu_gyro[0], g)
    # identity rig: the lidar-frame lists alias the raw ones (zero cost)
    sys_i = lvi.LviSystem(lvi.LviConfig(use_lidar_depth=False,
                                        use_loop_detector=False))
    assert sys_i.imu_gyro_l is sys_i.imu_gyro
    assert sys_i.imu_acc_l is sys_i.imu_acc
