"""Preintegration tests: f64 numpy oracle, finite-difference bias Jacobians
(resurrecting the semantics of the reference's commented-out checkJacobian,
`integration_base.h:279-445`), residual consistency, and padding no-ops."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as Rsc

from lvislam_tpu.ops import preintegration as pre
from lvislam_tpu.core import lie

NOISE = pre.ImuNoise.create(0.1, 0.01, 0.001, 0.0001)


def synth_imu(rng, n=80, dt=0.005):
    """Smooth synthetic IMU stream."""
    t = np.arange(n) * dt
    gyr = np.stack(
        [0.8 * np.sin(2 * t), 0.5 * np.cos(3 * t), 0.3 * np.sin(t + 0.5)], axis=-1
    )
    acc = np.stack(
        [0.5 * np.sin(t), 9.8 + 0.2 * np.cos(2 * t), 1.0 * np.sin(3 * t)], axis=-1
    )
    dts = np.full(n, dt)
    return dts, acc, gyr


def numpy_midpoint_oracle(dts, accs, gyrs, ba, bg):
    """Independent f64 midpoint integration (delta only)."""
    dq = Rsc.identity()
    dp = np.zeros(3)
    dv = np.zeros(3)
    acc0, gyr0 = accs[0], gyrs[0]
    for dt, a1, g1 in zip(dts[1:], accs[1:], gyrs[1:]):
        un_acc0 = dq.apply(acc0 - ba)
        un_gyr = 0.5 * (gyr0 + g1) - bg
        # quaternion update with the [1, w dt/2] (unnormalized) increment
        q = dq.as_quat()  # xyzw
        h = un_gyr * dt / 2
        w0, v0 = q[3], q[:3]
        nw = w0 * 1.0 - v0 @ h
        nv = w0 * h + v0 + np.cross(v0, h)
        qn = np.concatenate([nv, [nw]])
        dq1_un = qn
        dq1 = Rsc.from_quat(qn / np.linalg.norm(qn))
        un_acc1 = dq1.apply(a1 - ba)
        un_acc = 0.5 * (un_acc0 + un_acc1)
        dp = dp + dv * dt + 0.5 * un_acc * dt * dt
        dv = dv + un_acc * dt
        dq = dq1
        acc0, gyr0 = a1, g1
    return dp, dq, dv


def run_preint(dts, accs, gyrs, ba, bg):
    st = pre.preint_init(accs[0], gyrs[0], ba, bg)
    return pre.preintegrate(
        st, jnp.array(dts[1:]), jnp.array(accs[1:]), jnp.array(gyrs[1:]), NOISE
    )


def test_delta_matches_f64_oracle(rng):
    dts, accs, gyrs = synth_imu(rng)
    ba, bg = np.array([0.05, -0.02, 0.01]), np.array([0.002, 0.001, -0.003])
    st = run_preint(dts, accs, gyrs, ba, bg)
    dp, dq, dv = numpy_midpoint_oracle(dts, accs, gyrs, ba, bg)
    np.testing.assert_allclose(np.asarray(st.delta_p), dp, atol=2e-4)
    np.testing.assert_allclose(np.asarray(st.delta_v), dv, atol=2e-4)
    got_R = np.asarray(lie.quat_to_matrix(st.delta_q))
    np.testing.assert_allclose(got_R, dq.as_matrix(), atol=1e-4)
    assert abs(float(st.sum_dt) - dts[1:].sum()) < 1e-5


def test_padding_noop(rng):
    dts, accs, gyrs = synth_imu(rng, n=40)
    ba = np.zeros(3)
    bg = np.zeros(3)
    st = run_preint(dts, accs, gyrs, ba, bg)
    # pad with dt=0 repeats of the last sample
    dts_p = np.concatenate([dts, np.zeros(16)])
    accs_p = np.concatenate([accs, np.tile(accs[-1], (16, 1))])
    gyrs_p = np.concatenate([gyrs, np.tile(gyrs[-1], (16, 1))])
    st_p = run_preint(dts_p, accs_p, gyrs_p, ba, bg)
    np.testing.assert_allclose(np.asarray(st_p.delta_p), np.asarray(st.delta_p), atol=1e-6)
    np.testing.assert_allclose(np.asarray(st_p.covariance), np.asarray(st.covariance), atol=1e-7)
    np.testing.assert_allclose(np.asarray(st_p.jacobian), np.asarray(st.jacobian), atol=1e-6)


def test_bias_jacobian_finite_difference(rng):
    """J @ db must predict the delta change under repropagation with b+db."""
    dts, accs, gyrs = synth_imu(rng, n=60)
    ba, bg = np.zeros(3), np.zeros(3)
    st = run_preint(dts, accs, gyrs, ba, bg)
    eps = 1e-3
    dba = np.array([1.0, -0.5, 0.8]) * eps
    dbg = np.array([-0.6, 1.0, 0.4]) * eps
    st2 = run_preint(dts, accs, gyrs, ba + dba, bg + dbg)

    J = np.asarray(st.jacobian)
    dp_pred = J[0:3, 9:12] @ dba + J[0:3, 12:15] @ dbg
    dv_pred = J[6:9, 9:12] @ dba + J[6:9, 12:15] @ dbg
    dp_true = np.asarray(st2.delta_p) - np.asarray(st.delta_p)
    dv_true = np.asarray(st2.delta_v) - np.asarray(st.delta_v)
    np.testing.assert_allclose(dp_pred, dp_true, rtol=0.05, atol=2e-5)
    np.testing.assert_allclose(dv_pred, dv_true, rtol=0.05, atol=2e-5)

    # rotation: delta_q(b+db) ≈ delta_q(b) ⊗ [1, ½ J_q dbg]
    dq_pred = J[3:6, 12:15] @ dbg
    q1 = np.asarray(st.delta_q)
    q2 = np.asarray(st2.delta_q)
    q_rel = np.asarray(
        lie.quat_multiply(lie.quat_conjugate(jnp.array(q1)), jnp.array(q2))
    )
    dq_true = 2.0 * q_rel[1:4]
    np.testing.assert_allclose(dq_pred, dq_true, rtol=0.05, atol=2e-5)


def test_bias_corrected_evaluate_zero_residual(rng):
    """Dead-reckon ground truth with gravity; evaluate() must vanish."""
    dts, accs, gyrs = synth_imu(rng, n=60)
    ba, bg = np.zeros(3), np.zeros(3)
    g_world = np.array([0.0, 0.0, -9.81])

    # Build true world trajectory: start at rest with attitude R0 = I,
    # accelerometer measures R^T (a_world - g); we instead *define* the world
    # acceleration from the measurements: a_w = R(acc) + g.
    st = run_preint(dts, accs, gyrs, ba, bg)
    nav0 = pre.navstate_identity()
    nav1 = pre.navstate_predict(
        nav0,
        jnp.array(dts[1:]),
        jnp.array(accs[1:]),
        jnp.array(gyrs[1:]),
        jnp.array(g_world),
        prev_acc=jnp.array(accs[0]),
        prev_gyr=jnp.array(gyrs[0]),
    )
    # evaluate() convention: G is positive-down contribution, i.e. residual
    # uses 0.5*G*dt² + Pj ... with G = -g_world (VINS G = (0,0,9.8)).
    res = pre.evaluate(
        st,
        nav0.pos, nav0.quat, nav0.vel, jnp.zeros(3), jnp.zeros(3),
        nav1.pos, nav1.quat, nav1.vel, jnp.zeros(3), jnp.zeros(3),
        jnp.array(-g_world),
    )
    np.testing.assert_allclose(np.asarray(res), 0.0, atol=5e-4)


def test_covariance_psd_growth(rng):
    dts, accs, gyrs = synth_imu(rng, n=60)
    st = run_preint(dts, accs, gyrs, np.zeros(3), np.zeros(3))
    cov = np.asarray(st.covariance, dtype=np.float64)
    np.testing.assert_allclose(cov, cov.T, atol=1e-8)
    eig = np.linalg.eigvalsh(cov)
    assert eig.min() > -1e-10
    assert cov[0, 0] > 0 and cov[3, 3] > 0 and cov[6, 6] > 0


def test_gyro_rotation_table(rng):
    dts, accs, gyrs = synth_imu(rng, n=50)
    table = np.asarray(pre.gyro_rotation_table(jnp.array(dts), jnp.array(gyrs)))
    assert table.shape == (51, 4)
    # against scipy incremental exp products
    R = Rsc.identity()
    for i, (dt, g) in enumerate(zip(dts, gyrs)):
        R = R * Rsc.from_rotvec(g * dt)
        got = Rsc.from_quat(np.roll(table[i + 1], -1))
        err = (R.inv() * got).magnitude()
        assert err < 1e-3


def test_navstate_predict_parallel_matches_sequential(rng):
    """The associative-scan dead-reckoning must reproduce the literal
    per-sample recursion (padding rows, biases, prev-sample seeds and all)."""
    dts, accs, gyrs = synth_imu(rng, n=64)
    dts[50:] = 0.0  # zero-dt padding tail, as the pipelines pad
    nav0 = pre.NavState(
        pos=jnp.asarray(rng.normal(size=3), jnp.float32),
        quat=jnp.asarray(lie.quat_normalize(jnp.asarray(rng.normal(size=4), jnp.float32))),
        vel=jnp.asarray(rng.normal(size=3), jnp.float32),
        ba=jnp.asarray(0.05 * rng.normal(size=3), jnp.float32),
        bg=jnp.asarray(0.01 * rng.normal(size=3), jnp.float32),
    )
    G = jnp.array([0.0, 0.0, -9.805], jnp.float32)
    kw = dict(
        prev_acc=jnp.asarray(rng.normal(size=3), jnp.float32),
        prev_gyr=jnp.asarray(0.3 * rng.normal(size=3), jnp.float32),
    )
    a = pre.navstate_predict(nav0, jnp.asarray(dts), jnp.asarray(accs), jnp.asarray(gyrs), G, **kw)
    b = pre.navstate_predict_seq(nav0, jnp.asarray(dts), jnp.asarray(accs), jnp.asarray(gyrs), G, **kw)
    np.testing.assert_allclose(np.asarray(a.quat), np.asarray(b.quat), atol=2e-6)
    np.testing.assert_allclose(np.asarray(a.vel), np.asarray(b.vel), atol=2e-4)
    np.testing.assert_allclose(np.asarray(a.pos), np.asarray(b.pos), atol=2e-4)


def test_navstate_predict_np_matches_device(rng):
    """The host-side glue dead-reckoner must match the device version."""
    dts, accs, gyrs = synth_imu(rng, n=40)
    nav0 = pre.NavState(
        pos=jnp.asarray(rng.normal(size=3), jnp.float32),
        quat=jnp.asarray(lie.quat_normalize(jnp.asarray(rng.normal(size=4), jnp.float32))),
        vel=jnp.asarray(rng.normal(size=3), jnp.float32),
        ba=jnp.asarray(0.05 * rng.normal(size=3), jnp.float32),
        bg=jnp.asarray(0.01 * rng.normal(size=3), jnp.float32),
    )
    G = np.array([0.0, 0.0, -9.805])
    a = pre.navstate_predict(
        nav0, jnp.asarray(dts), jnp.asarray(accs), jnp.asarray(gyrs),
        jnp.asarray(G, jnp.float32))
    p, q, v = pre.navstate_predict_np(
        np.asarray(nav0.pos), np.asarray(nav0.quat), np.asarray(nav0.vel),
        np.asarray(nav0.ba), np.asarray(nav0.bg), dts, accs, gyrs, G)
    np.testing.assert_allclose(np.asarray(a.pos), p, atol=5e-4)
    np.testing.assert_allclose(np.asarray(a.quat), q, atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.vel), v, atol=5e-4)
