"""IMU fusion node tests: dead-reckoning accuracy (BASELINE config 1), bias
estimation through lidar corrections, and failure reset."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as Rsc

from lvislam_tpu.utils import synthetic as syn
from lvislam_tpu.models.lio import imu_fusion as fus
from lvislam_tpu.ops import preintegration as pre
from lvislam_tpu.core import lie

PARAMS = fus.FusionParams(imuGravity=syn.GRAVITY)


def test_config1_dead_reckoning():
    """IMU-only preintegration dead reckoning on a clean synthetic stream:
    exercise the imuPreintegration predict path over 5 s."""
    traj = syn.figure8_trajectory(scale=3.0, period=30.0)
    t, w, f = syn.simulate_imu_stream(traj, 0.0, 5.0, rate=200.0)
    p0, R0 = traj.pose(np.array([0.0]))
    v0 = (traj.pose(np.array([1e-4]))[0][0] - traj.pose(np.array([-1e-4]))[0][0]) / 2e-4
    st = fus.FusionState(
        pos=jnp.array(p0[0], jnp.float32),
        quat=jnp.array(np.roll(Rsc.from_matrix(R0[0]).as_quat(), 1), jnp.float32),
        vel=jnp.array(v0, jnp.float32),
        ba=jnp.zeros(3), bg=jnp.zeros(3),
        sqrt_info=jnp.eye(15), initialized=jnp.array(True),
        failed=jnp.array(False), reset_id=jnp.int32(0),
    )
    dts = np.diff(t, prepend=t[0]).astype(np.float32)
    ps, qs, vs = fus.predict_imu_rate(
        st, jnp.array(dts), jnp.array(f, dtype=jnp.float32),
        jnp.array(w, dtype=jnp.float32), PARAMS
    )
    gt_pos, _ = traj.pose(t)
    err = np.linalg.norm(np.asarray(ps) - gt_pos, axis=1)
    # pure dead reckoning drifts quadratically; clean IMU @200Hz over 5 s
    # should stay well under a meter
    assert err[-1] < 0.5, err[-1]
    assert err[: len(err) // 2].max() < 0.15


def test_fusion_estimates_bias():
    """Lidar corrections at 10 Hz + biased IMU: the smoother must converge
    toward the injected gyro/accel bias."""
    traj = syn.figure8_trajectory(scale=3.0, period=30.0)
    true_bg = np.array([0.02, -0.01, 0.015])
    true_ba = np.array([0.05, 0.08, -0.06])
    t, w, f = syn.simulate_imu_stream(
        traj, 0.0, 8.0, rate=200.0, gyro_bias=true_bg, accel_bias=true_ba,
        gyro_noise=1e-4, accel_noise=1e-3,
    )
    # the reference's bias random walk (6e-5) pins biases for minutes; use a
    # honest-for-this-IMU walk so estimation is observable within the test
    params = fus.FusionParams(
        imuGravity=syn.GRAVITY, imuAccBiasN=2e-2, imuGyrBiasN=5e-3,
        priorBiasSigma=0.1,
    )
    st = fus.fusion_init(params)
    # init with first lidar pose
    p0, R0 = traj.pose(np.array([0.0]))
    q0 = np.roll(Rsc.from_matrix(R0[0]).as_quat(), 1)
    st = fus.fusion_initialize(st, jnp.array(p0[0], jnp.float32), jnp.array(q0, jnp.float32), params)

    rate = 10.0
    N = 24  # IMU samples per correction window (200/10=20 + pad)
    for k in range(1, int(8.0 * rate)):
        tk = k / rate
        sel = (t > tk - 1.0 / rate) & (t <= tk)
        ts = t[sel]
        dts = np.zeros(N, np.float32)
        accs = np.zeros((N, 3), np.float32)
        gyrs = np.zeros((N, 3), np.float32)
        n = len(ts)
        dts[:n] = np.diff(ts, prepend=tk - 1.0 / rate)
        accs[:n] = f[sel]
        gyrs[:n] = w[sel]
        if n > 0 and n < N:
            accs[n:] = accs[n - 1]
            gyrs[n:] = gyrs[n - 1]
        p, R = traj.pose(np.array([tk]))
        q = np.roll(Rsc.from_matrix(R[0]).as_quat(), 1)
        st = fus.fusion_correct(
            st, jnp.array(dts), jnp.array(accs), jnp.array(gyrs),
            jnp.array(p[0], jnp.float32), jnp.array(q, jnp.float32),
            jnp.array(False), params,
        )
        assert not bool(st.failed)

    # The reference's stiff bias priors (sigma 1e-3) relax only through the
    # random-walk noise, so full convergence takes minutes; within 8 s the
    # estimate must have moved substantially toward the truth.
    bg_est = np.asarray(st.bg)
    assert np.linalg.norm(bg_est - true_bg) < 0.6 * np.linalg.norm(true_bg), bg_est
    assert bg_est[0] > 0.005  # correct sign and magnitude on the largest axis
    # fused pose should track ground truth closely
    p_end, _ = traj.pose(np.array([int(8.0 * rate - 1) / rate]))
    assert np.linalg.norm(np.asarray(st.pos) - p_end[0]) < 0.1


def test_failure_reset():
    params = PARAMS
    st = fus.fusion_init(params)
    st = fus.fusion_initialize(st, jnp.zeros(3), lie.quat_identity(), params)
    # absurd accelerations -> runaway velocity -> failure
    N = 32
    dts = jnp.full(N, 0.005)
    accs = jnp.tile(jnp.array([500.0, 0.0, 9.81]), (N, 1))
    gyrs = jnp.zeros((N, 3))
    st2 = fus.fusion_correct(
        st, dts, accs, gyrs, jnp.zeros(3), lie.quat_identity(),
        jnp.array(False), params,
    )
    assert bool(st2.failed)
    assert int(st2.reset_id) == int(st.reset_id) + 1
    assert not bool(st2.initialized)
