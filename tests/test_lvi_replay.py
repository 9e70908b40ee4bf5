"""Batched fused replay (models/replay.py) parity with the interactive
LVI path: identical synthetic streams through `replay_batch=1` and
`replay_batch=8` systems must yield near-identical trajectories, with the
batched system actually running the staged device-resident path.

Documented deviations that bound the tolerance (replay.py module docs):
per-batch (not per-frame) td refresh, guess propagated on device, depth
ring placed at the scan-stamp guess."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as Rsc

from lvislam_tpu.utils import synthetic as syn
from lvislam_tpu.utils.metrics import ate_rmse

from test_lvi_system import make_system


def _feed(sys_, world, traj, duration, lidar_rate=10.0, cam_rate=10.0,
          imu_rate=200.0):
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


@pytest.mark.slow
def test_replay_parity_with_interactive_path():
    world = syn.default_world(seed=0)
    traj = syn.figure8_trajectory(scale=3.0, period=30.0)
    duration = 4.0

    sys_a = make_system()
    sys_b = make_system()
    sys_b.cfg.replay_batch = 8

    _feed(sys_a, world, traj, duration)
    _feed(sys_b, world, traj, duration)
    sys_a.run()
    sys_b.run()

    # the batched system must have actually activated staged replay
    assert sys_b._replay_statics is not None, "replay never activated"
    assert sys_b._replay_active
    assert bool(np.asarray(sys_b.vio.initialized))

    # identical scan set processed
    assert len(sys_a.trajectory) == len(sys_b.trajectory)
    stamps_a = [t for t, _ in sys_a.trajectory]
    stamps_b = [t for t, _ in sys_b.trajectory]
    assert stamps_a == stamps_b

    pos_a = np.stack([np.asarray(x6)[3:6] for _, x6 in sys_a.trajectory])
    pos_b = np.stack([np.asarray(x6)[3:6] for _, x6 in sys_b.trajectory])
    gt = np.stack([traj.pose(np.array([t]))[0][0]
                   for t, _ in sys_a.trajectory])

    rmse_a = ate_rmse(pos_a, gt, align=True)
    rmse_b = ate_rmse(pos_b, gt, align=True)
    assert rmse_a < 0.15, f"interactive ATE {rmse_a}"
    assert rmse_b < 0.15, f"batched ATE {rmse_b}"

    # trajectories agree (same scans, same solves; td staleness and the
    # device-side guess propagation allow small per-pose differences)
    d = np.linalg.norm(pos_a - pos_b, axis=-1)
    assert float(np.max(d)) < 0.10, f"max pose gap {d.max()}"

    # the batched run drained everything (no stranded events/readbacks)
    assert not sys_b._ev_rows
    assert sys_b._rp_results is None or sys_b._rp_results.empty()


@pytest.mark.slow
def test_replay_partial_batch_flush():
    """A run() that ends mid-batch must flush via no-op padded rows and
    keep the trajectory complete and ordered."""
    world = syn.default_world(seed=0)
    traj = syn.figure8_trajectory(scale=3.0, period=30.0)

    sys_ = make_system()
    sys_.cfg.replay_batch = 8
    _feed(sys_, world, traj, 3.0)
    sys_.run()
    n1 = len(sys_.trajectory)
    # second drive: continues the SAME batched carry
    _feed_more_start = 3.0
    duration2 = 1.0
    imu_ts = _feed_more_start + (np.arange(int(duration2 * 200)) + 1) / 200.0
    w_all, f_all = traj.imu(imu_ts)
    for i, t in enumerate(imu_ts):
        _, R = traj.pose(np.array([t]))
        rpy = Rsc.from_matrix(R[0]).as_euler("ZYX")[::-1]
        sys_.feed_imu(t, w_all[i], f_all[i], rpy=np.array(rpy, np.float32))
    for i in range(int(duration2 * 10)):
        ts = 2.95 + 0.1 + i / 10.0
        scan = syn.simulate_lidar_scan(world, traj, ts, n_scan=4, horizon=900,
                                       sweep_time=0.1)
        sys_.feed_lidar(ts, scan)
    sys_.run()
    assert len(sys_.trajectory) > n1
    stamps = [t for t, _ in sys_.trajectory]
    assert stamps == sorted(stamps)
    assert not sys_._ev_rows
    assert sys_._rp_results is None or sys_._rp_results.empty()
