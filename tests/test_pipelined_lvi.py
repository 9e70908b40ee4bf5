"""Pipelined multi-chip LVI fusion: the tracker, estimator and LIO stages
placed on three (virtual CPU) devices, overlapped by async dispatch — the
reference's multi-process concurrency (`feature_tracker_node` publishes,
`estimator_node` consumes one frame later via its feature queue,
`estimator_node.cpp:258-303`) mapped onto a TPU pod. Verifies the split
stage functions (`frame_step.track_stage`/`estimate_stage`), the
cross-device exchanges (depth ring LIO->tracker, features tracker->
estimator) and end-to-end accuracy parity with the fused path."""

import dataclasses

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as Rsc

import jax

from lvislam_tpu.models import pipeline as lvi
from lvislam_tpu.utils import synthetic as syn
from lvislam_tpu.utils.metrics import ate_rmse

from test_lvi_system import make_system


def _make_pipelined_system():
    base = make_system()
    devs = jax.devices("cpu")[:3]
    assert len(devs) == 3, "conftest provides 8 virtual CPU devices"
    cfg = dataclasses.replace(base.cfg, pipeline_devices=tuple(devs))
    return lvi.LviSystem(cfg)


def _feed_streams(sys_, duration=4.0):
    world = syn.default_world(seed=0)
    traj = syn.figure8_trajectory(scale=3.0, period=30.0)
    lidar_rate, cam_rate, imu_rate = 10.0, 10.0, 200.0

    n_imu = int(duration * imu_rate)
    imu_ts = (np.arange(n_imu) + 1) / imu_rate
    w_all, f_all = traj.imu(imu_ts)
    for i, t in enumerate(imu_ts):
        _, R = traj.pose(np.array([t]))
        rpy = Rsc.from_matrix(R[0]).as_euler("ZYX")[::-1]
        sys_.feed_imu(t, w_all[i], f_all[i], rpy=np.array(rpy, np.float32))

    for i in range(int(duration * lidar_rate) - 1):
        ts = 0.05 + i / lidar_rate
        scan = syn.simulate_lidar_scan(world, traj, ts, n_scan=4,
                                       horizon=900, sweep_time=0.1)
        sys_.feed_lidar(ts, scan)

    for i in range(int(duration * cam_rate) - 1):
        ts = 0.1 + i / cam_rate
        img = syn.render_camera_image(world, traj, ts, width=320, height=240,
                                      f=200.0)
        sys_.feed_image(ts, img)
    return traj


@pytest.mark.slow
def test_pipelined_lvi_full_fusion():
    sys_ = _make_pipelined_system()
    traj = _feed_streams(sys_)
    sys_.run()

    # stage placement actually took effect
    assert sys_._pipelined
    assert sys_.lio.state.x6.devices() == {sys_._dev_lio}
    assert sys_.tracker.pts.devices() == {sys_._dev_trk}
    assert sys_.vio.ws.Ps.devices() == {sys_._dev_vio}

    # LIS trajectory quality — same bar as the fused path
    est_pos = np.stack([x6[3:6] for _, x6 in sys_.trajectory])
    gt = np.stack([traj.pose(np.array([t]))[0][0]
                   for t, _ in sys_.trajectory])
    rmse = ate_rmse(est_pos, gt, align=True)
    assert rmse < 0.15, f"LIO ATE {rmse}"

    # the one-frame-delayed estimator still initializes off the lidar
    # odometry (exchange 3) and feeds healthy guesses back (exchange 1)
    assert bool(np.asarray(sys_.vio.initialized))
    assert sys_.vins_odom is not None
    assert int(sys_.vio.failure_count) == 0
    # the estimator has consumed every frame but the (drained) pipeline tail
    assert sys_.vio_frames >= len(sys_.frame_times) - 1
