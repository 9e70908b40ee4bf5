"""Hand-eye extrinsic rotation calibration (`initial_ex_rotation.cpp:11-67`)
— the op recovers an arbitrary camera-IMU rotation, and the estimator's
ESTIMATE_EXTRINSIC=2 bootstrap path converges online from identity."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as Rsc

from lvislam_tpu.core import lie
from lvislam_tpu.ops import handeye
from lvislam_tpu.models.vio import estimator as est
from lvislam_tpu.models.vio import feature_manager as fm
from lvislam_tpu.ops import ba


def _q(Rm):
    return np.roll(Rsc.from_matrix(Rm).as_quat(), 1)


def test_handeye_op_recovers_rotation():
    rng = np.random.default_rng(0)
    R_ic = Rsc.from_euler("zyx", [40, -25, 70], degrees=True).as_matrix()
    q_true = _q(R_ic)
    q_cam, q_imu = [], []
    for _ in range(24):
        ax = rng.normal(size=3); ax /= np.linalg.norm(ax)
        R_b = Rsc.from_rotvec(np.radians(rng.uniform(5, 25)) * ax).as_matrix()
        q_imu.append(_q(R_b))
        q_cam.append(_q(R_ic.T @ R_b @ R_ic))
    res = handeye.calibrate_rotation(
        jnp.asarray(np.stack(q_cam), jnp.float32),
        jnp.asarray(np.stack(q_imu), jnp.float32),
        jnp.ones(24, bool), jnp.array([1.0, 0, 0, 0], jnp.float32),
    )
    assert bool(res.ok)
    q_est = np.asarray(res.q_ic)
    ang = np.degrees(2 * np.arccos(min(1.0, abs(float(np.dot(q_est, q_true))))))
    assert ang < 0.5, ang


def test_handeye_rejects_insufficient_excitation():
    """Single-axis rotation leaves the about-axis component unobservable:
    sv2 must stay below threshold (`:56-63`)."""
    rng = np.random.default_rng(1)
    R_ic = Rsc.from_euler("zyx", [10, 5, -15], degrees=True).as_matrix()
    ax = np.array([0.0, 0.0, 1.0])
    q_cam, q_imu = [], []
    for _ in range(24):
        R_b = Rsc.from_rotvec(np.radians(rng.uniform(5, 25)) * ax).as_matrix()
        q_imu.append(_q(R_b))
        q_cam.append(_q(R_ic.T @ R_b @ R_ic))
    res = handeye.calibrate_rotation(
        jnp.asarray(np.stack(q_cam), jnp.float32),
        jnp.asarray(np.stack(q_imu), jnp.float32),
        jnp.ones(24, bool), jnp.array([1.0, 0, 0, 0], jnp.float32),
    )
    assert not bool(res.ok)


def test_estimator_extrinsic_bootstrap():
    """ESTIMATE_EXTRINSIC=2 through process_imu/process_image: starting from
    identity, the online hand-eye recovers the true camera-IMU rotation from
    a rotation-rich trajectory (`estimator.cpp:160-186`)."""
    CAPS = fm.VioCaps(window=6, max_features=96, imu_buf=32,
                      frame_features=64, ex_pairs=24)
    PARAMS = est.VioParams(use_visual_init=False,
                           estimate_extrinsic_rotation=True, ex_min_pairs=8)
    CFG = ba.BAConfig(window=6, max_features=96, iterations=2,
                      estimate_td=False, estimate_extrinsic=False)

    rng = np.random.default_rng(2)
    # true extrinsic: the usual forward-camera axis permutation (cam z ->
    # body x) plus a 5-15 deg misalignment the calibration must recover
    R_BC = np.array([[0.0, 0.0, 1.0], [-1.0, 0.0, 0.0], [0.0, -1.0, 0.0]]).T
    R_ic_true = R_BC @ Rsc.from_euler("zyx", [12, -6, 9], degrees=True).as_matrix()
    q_true = _q(R_ic_true)
    # landmark shell surrounding the trajectory: some are always in view
    X = rng.uniform(-18, 18, (400, 3))
    X = X[np.linalg.norm(X, axis=1) > 7.0]

    rate, imu_rate = 10.0, 200.0
    n_frames = 22
    # rotation-rich body trajectory: sinusoidal rpy swings + small circle
    def pose(t):
        # ~8-10 deg of rotation per frame: the sv2>0.25 excitation gate
        # needs noticeable rotation with a 24-pair ring (the reference
        # accumulates pairs unboundedly; our ring caps the sqrt(N) growth)
        rpy = np.array([0.6 * np.sin(3.2 * t), 0.5 * np.sin(2.7 * t + 1.0),
                        0.7 * np.sin(2.1 * t + 2.0)])
        R = Rsc.from_euler("xyz", rpy).as_matrix()
        # enough translation per frame that the epipolar geometry is
        # well-conditioned (the 8-pt R estimate feeds the hand-eye)
        p = np.array([2.0 * np.cos(0.8 * t), 2.0 * np.sin(0.8 * t),
                      0.3 * np.sin(2.0 * t)])
        return p, R

    state = est.vio_init(CAPS, PARAMS)
    assert not bool(state.ric_ok)
    N, M = CAPS.frame_features, CAPS.imu_buf

    for k in range(n_frames):
        t = k / rate
        if k > 0:
            # constant-rate gyro between frames from the relative rotation
            _, R0 = pose((k - 1) / rate)
            _, R1 = pose(t)
            w = Rsc.from_matrix(R0.T @ R1).as_rotvec() * rate
            n = int(imu_rate / rate)
            dts = np.zeros(M, np.float32); dts[:n] = 1.0 / imu_rate
            gyrs = np.tile(w.astype(np.float32), (M, 1))
            accs = np.tile((R1.T @ [0, 0, 9.81]).astype(np.float32), (M, 1))
            state = est.process_imu(state, jnp.array(dts), jnp.array(accs),
                                    jnp.array(gyrs), CAPS, PARAMS)
        p, R = pose(t)
        Rc = R @ R_ic_true  # camera orientation (t_ic = 0)
        Xc = (X - p) @ Rc
        z = Xc[:, 2]
        norm = Xc[:, :2] / np.maximum(z[:, None], 1e-6)
        ok = (z > 1.0) & (np.abs(norm) < 0.9).all(axis=1)
        ids = np.full(N, -1, np.int32)
        nm = np.zeros((N, 2), np.float32)
        sel = np.nonzero(ok)[0][:N]
        ids[: len(sel)] = sel
        nm[: len(sel)] = norm[sel]
        no_seed = dict(
            available=jnp.array(False), Ps=jnp.zeros((CAPS.window + 1, 3)),
            Qs=jnp.tile(jnp.array([1.0, 0, 0, 0]), (CAPS.window + 1, 1)),
            Vs=jnp.zeros((CAPS.window + 1, 3)), ba=jnp.zeros(3), bg=jnp.zeros(3),
        )
        state, out = est.process_image(
            state, jnp.array(ids), jnp.array(nm),
            jnp.zeros((N, 2), jnp.float32), jnp.full(N, -1.0, jnp.float32),
            jnp.array(ids >= 0), no_seed, CAPS, PARAMS, CFG,
        )

    assert bool(state.ric_ok), (
        f"hand-eye did not converge (sv2 path); ex_count={int(state.ex_count)}")
    q_est = np.asarray(state.ws.qic)
    ang = np.degrees(2 * np.arccos(min(1.0, abs(float(np.dot(q_est, q_true))))))
    assert ang < 3.0, (ang, q_est, q_true)
