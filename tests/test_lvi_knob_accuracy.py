"""Fused-replay accuracy regression gate for the bench perf-knob set.

Round 3 shipped a silent 2.6x ATE regression (0.052 -> 0.138 m) through the
bench-only perf knobs (schur / nnRefreshEvery / mapRebuildEvery / mapping
throttle) because nothing in the suite replayed the fused system WITH those
knobs. This test replays the same synthetic LVI sequence twice — exact
configuration vs `bench.apply_perf_knobs` (the literal function bench.py
uses) — and gates the knob set's accuracy cost. It fails loudly on any
future knob that trades >40% ATE for speed.

Reference behavior being preserved: the knobs approximate
`mapOptimization.cpp:894-970` (kd-tree rebuild + 5-NN refresh every solve)
and the shipped 0.15 s mapping throttle (`params_lidar.yaml`); the
reference pays full accuracy for them, so must we (within tolerance).
"""

import sys
from pathlib import Path

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as Rsc

from lvislam_tpu.utils import synthetic as syn
from lvislam_tpu.utils.metrics import ate_rmse

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from bench import apply_perf_knobs  # noqa: E402

from test_lvi_system import make_system  # noqa: E402


def _replay(knobs: bool, duration: float = 4.0) -> float:
    sys_ = make_system(pallas=False)
    sys_.cfg.replay_batch = 16
    if knobs:
        apply_perf_knobs(sys_, pallas=False)
    world = syn.default_world(seed=0)
    traj = syn.figure8_trajectory(scale=3.0, period=30.0)

    imu_ts = (np.arange(int(duration * 200)) + 1) / 200
    w_all, f_all = traj.imu(imu_ts)
    for i, t in enumerate(imu_ts):
        _, R = traj.pose(np.array([t]))
        rpy = Rsc.from_matrix(R[0]).as_euler("ZYX")[::-1]
        sys_.feed_imu(t, w_all[i], f_all[i], rpy=np.array(rpy, np.float32))
    for i in range(int(duration * 10) - 1):
        ts = 0.05 + i / 10
        sys_.feed_lidar(ts, syn.simulate_lidar_scan(
            world, traj, ts, n_scan=4, horizon=900, sweep_time=0.1))
    for i in range(int(duration * 10) - 1):
        ts = 0.1 + i / 10
        sys_.feed_image(ts, syn.render_camera_image(
            world, traj, ts, width=320, height=240, f=200.0))
    sys_.run()

    est_pos = np.stack([x6[3:6] for _, x6 in sys_.trajectory])
    gt = np.stack([traj.pose(np.array([t]))[0][0]
                   for t, _ in sys_.trajectory])
    return float(ate_rmse(est_pos, gt, align=True))


@pytest.mark.slow
def test_bench_knob_set_does_not_cost_accuracy():
    ate_exact = _replay(knobs=False)
    ate_knobs = _replay(knobs=True)
    # sanity: the exact replay itself must be healthy (same bar as
    # test_lvi_full_fusion)
    assert ate_exact < 0.15, f"exact-knob replay unhealthy: {ate_exact}"
    # the r3 regression was 2.6x; gate at 1.4x so any future knob that
    # silently trades accuracy for speed fails here before it ships
    assert ate_knobs <= max(1.4 * ate_exact, ate_exact + 0.01), (
        f"perf knobs cost too much accuracy: exact={ate_exact:.4f} m, "
        f"knobs={ate_knobs:.4f} m")
