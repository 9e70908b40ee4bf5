"""VIO-only runner smoke test (configs 2/4 plumbing): rendered images + IMU
through tracker + estimator, including the FREQ throttle and restart
protocol."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as Rsc

from lvislam_tpu.core.config import CameraIntrinsics
from lvislam_tpu.models.vio.pipeline import VioRunner, VioRunnerConfig
from lvislam_tpu.models.vio import feature_tracker as ft, feature_manager as fm
from lvislam_tpu.models.vio import estimator as est
from lvislam_tpu.ops import ba
from lvislam_tpu.utils import synthetic as syn

R_BC = np.array([[0.0, 0.0, 1.0], [-1.0, 0.0, 0.0], [0.0, -1.0, 0.0]]).T


def test_vio_runner_smoke():
    cam = CameraIntrinsics(
        model_type="PINHOLE", gamma1=200.0, gamma2=200.0, u0=160.0, v0=120.0,
        k1=0.0, k2=0.0, p1=0.0, p2=0.0,
    )
    qic = np.roll(Rsc.from_matrix(R_BC).as_quat(), 1)
    cfg = VioRunnerConfig(
        camera=cam,
        tracker=ft.TrackerParams(max_cnt=64, min_dist=16, klt_levels=2,
                                 klt_half=7, klt_iters=15, equalize=False),
        caps=fm.VioCaps(window=6, max_features=96, imu_buf=32, frame_features=64),
        params=est.VioParams(g_norm=syn.GRAVITY),
        ba=ba.BAConfig(window=6, max_features=96, iterations=3,
                       estimate_td=False, estimate_extrinsic=False),
        image_height=240, image_width=320,
        freq=10.0,
        qic=tuple(qic.tolist()),
    )
    runner = VioRunner(cfg)
    world = syn.default_world(seed=3)
    traj = syn.figure8_trajectory(scale=3.0, period=30.0)

    imu_rate, cam_rate, dur = 200.0, 10.0, 1.6
    ts_imu = (np.arange(int(dur * imu_rate)) + 1) / imu_rate
    w_all, f_all = traj.imu(ts_imu)
    events = [(t, "imu", i) for i, t in enumerate(ts_imu)]
    events += [(0.1 + i / cam_rate, "img", i) for i in range(int(dur * cam_rate) - 1)]
    events.sort(key=lambda e: e[0])

    outs = []
    for t, kind, i in events:
        if kind == "imu":
            runner.feed_imu(t, w_all[i], f_all[i])
        else:
            img = syn.render_camera_image(world, traj, t, width=320, height=240, f=200.0)
            outs.append(runner.feed_image(t, img))
    assert sum(o is not None for o in outs) >= 10
    # tracker produced live features and the estimator consumed frames
    assert int(runner.vio.frame_count) >= 6
    assert int((np.asarray(runner.vio.table.ids) >= 0).sum()) > 20
