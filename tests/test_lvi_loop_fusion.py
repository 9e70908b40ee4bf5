"""Exchange 4 end-to-end in the FUSED system: a revisit on a closed circular
orbit must produce a visual BoW loop candidate that travels through
`LviSystem._loop_detect` -> `loop_closure_external` (the repaired
match_frame channel) -> ICP verify -> pose-graph factor, observable as
`n_loops > 0` on the LIS state. (`test_lvi_system` runs the fusion with the
detector OFF; `test_loop_detector` covers the detector piecewise.)"""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as Rsc

from lvislam_tpu.utils import synthetic as syn
from lvislam_tpu.utils.metrics import ate_rmse


@pytest.mark.slow
def test_lvi_fusion_with_loop_detector():
    import tests.test_lvi_system as base
    import dataclasses

    sys_ = base.make_system()
    cfg = dataclasses.replace(
        sys_.cfg, use_loop_detector=True,
        # disable the LIS-internal radius-based detector so any loop factor
        # observed can ONLY have come through the visual channel
        lio=dataclasses.replace(sys_.cfg.lio, loop_every_n_scans=10 ** 6),
        # the orbit revisits after one period (~80 camera frames); keep the
        # exclusion window shorter than that. min_loop_matches is scaled to
        # the 64-feature synthetic setup (the reference: 25 of 150 at
        # 640x480); the visual candidate is a PROPOSAL — the LIS-side ICP
        # fitness gate in loop_closure_external decides the factor
        loop_caps=dataclasses.replace(
            sys_.cfg.loop_caps, recent_exclude=12, min_loop_matches=3,
        ),
        # the 5 Hz camera on a period-5s orbit moves ~50 px/frame; widen the
        # LK patch so the coarse level can carry that displacement
        tracker=dataclasses.replace(sys_.cfg.tracker, klt_patch=48),
    )
    sys_ = type(sys_)(cfg)

    world = syn.default_world(seed=0)
    traj = syn.circle_trajectory(radius=2.5, period=8.0)
    duration, lidar_rate, cam_rate, imu_rate = 10.0, 10.0, 10.0, 200.0

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
        img = syn.render_camera_image(world, traj, ts, width=320, height=240,
                                      f=200.0)
        sys_.feed_image(ts, img)

    sys_.run()

    # the visual loop candidate must have reached the LIS factor graph
    assert int(np.asarray(sys_.lio.state.n_loops)) > 0, (
        "no visual loop factor reached the pose graph"
    )
    est_pos = np.stack([x6[3:6] for _, x6 in sys_.trajectory])
    gt = np.stack([traj.pose(np.array([t]))[0][0] for t, _ in sys_.trajectory])
    rmse = ate_rmse(est_pos, gt, align=True)
    assert rmse < 0.15, f"LVI-with-loop ATE {rmse}"
