"""IMU preintegration engines.

Re-implements, as pure fixed-shape JAX functions, the reference's two IMU
integrators:

1. VINS midpoint preintegration with 15x15 error-state Jacobian and covariance
   (`vins_estimator/src/factor/integration_base.h:54-158`): delta
   pre-integrated position/rotation/velocity between keyframes, first-order
   bias correction (`evaluate`, `integration_base.h:160-186`), and
   `repropagate` = re-running the scan with new linearization biases.

2. GTSAM-style forward NavState propagation used by the LIS IMU node for the
   IMU-rate predict path (`lidar_odometry/src/imuPreintegration.cpp:494-499`).

TPU design notes:
- One IMU window is a `lax.scan` over a fixed-capacity buffer; padding samples
  carry dt=0, which makes the midpoint update an exact no-op (F=I, V=0), so no
  masks are needed inside the hot loop.
- Many windows (sliding-window BA needs WINDOW_SIZE=10 of them; batched replay
  needs B x 10) are processed with `vmap`, turning the 15x15 matrix chain into
  batched matmuls that XLA maps onto the MXU.
- Error-state ordering matches the reference: [P(0:3), R(3:6), V(6:9),
  BA(9:12), BG(12:15)].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..core import lie

O_P, O_R, O_V, O_BA, O_BG = 0, 3, 6, 9, 12


@struct.dataclass
class ImuNoise:
    """Continuous-time IMU noise densities (`params_camera.yaml` acc_n/gyr_n/
    acc_w/gyr_w; `params_lidar.yaml` imuAccNoise/imuGyrNoise/...)."""

    acc_n: jax.Array
    gyr_n: jax.Array
    acc_w: jax.Array
    gyr_w: jax.Array

    @classmethod
    def create(cls, acc_n, gyr_n, acc_w, gyr_w, dtype=jnp.float32):
        return cls(
            acc_n=jnp.asarray(acc_n, dtype),
            gyr_n=jnp.asarray(gyr_n, dtype),
            acc_w=jnp.asarray(acc_w, dtype),
            gyr_w=jnp.asarray(gyr_w, dtype),
        )

    def diag18(self) -> jax.Array:
        """Diagonal of the 18x18 process-noise matrix
        (`integration_base.h:21-27`)."""
        n = jnp.stack(
            [self.acc_n**2] * 3 + [self.gyr_n**2] * 3
            + [self.acc_n**2] * 3 + [self.gyr_n**2] * 3
            + [self.acc_w**2] * 3 + [self.gyr_w**2] * 3
        )
        return n


@struct.dataclass
class PreintState:
    """Pre-integrated IMU delta between two frames + linearization point."""

    delta_p: jax.Array  # (3,)
    delta_q: jax.Array  # (4,) wxyz
    delta_v: jax.Array  # (3,)
    jacobian: jax.Array  # (15, 15) d(delta)/d(state at linearization)
    covariance: jax.Array  # (15, 15)
    sum_dt: jax.Array  # ()
    linearized_ba: jax.Array  # (3,)
    linearized_bg: jax.Array  # (3,)
    acc_0: jax.Array  # (3,) previous accel sample
    gyr_0: jax.Array  # (3,) previous gyro sample


def preint_init(acc0, gyr0, ba, bg, dtype=jnp.float32) -> PreintState:
    z3 = jnp.zeros(3, dtype)
    return PreintState(
        delta_p=z3,
        delta_q=lie.quat_identity(dtype),
        delta_v=z3,
        jacobian=jnp.eye(15, dtype=dtype),
        covariance=jnp.zeros((15, 15), dtype),
        sum_dt=jnp.zeros((), dtype),
        linearized_ba=jnp.asarray(ba, dtype),
        linearized_bg=jnp.asarray(bg, dtype),
        acc_0=jnp.asarray(acc0, dtype),
        gyr_0=jnp.asarray(gyr0, dtype),
    )


def midpoint_step(state: PreintState, dt, acc_1, gyr_1, noise: ImuNoise) -> PreintState:
    """One midpoint preintegration update (`integration_base.h:54-128`).

    dt == 0 is an exact no-op (used for padding).
    """
    dtype = state.delta_p.dtype
    dt = jnp.asarray(dt, dtype)
    dq = state.delta_q
    ba, bg = state.linearized_ba, state.linearized_bg

    un_acc_0 = lie.quat_rotate(dq, state.acc_0 - ba)
    un_gyr = 0.5 * (state.gyr_0 + gyr_1) - bg
    new_dq_un = lie.quat_multiply(dq, lie.delta_q(un_gyr * dt))
    new_dq = lie.quat_normalize(new_dq_un)
    un_acc_1 = lie.quat_rotate(new_dq_un, acc_1 - ba)
    un_acc = 0.5 * (un_acc_0 + un_acc_1)
    new_dp = state.delta_p + state.delta_v * dt + 0.5 * un_acc * dt * dt
    new_dv = state.delta_v + un_acc * dt

    # --- error-state transition F (15x15) and noise map V (15x18) ---
    Rk = lie.quat_to_matrix(dq)
    Rk1 = lie.quat_to_matrix(new_dq_un)
    w_x = lie.skew(un_gyr)
    a0_x = lie.skew(state.acc_0 - ba)
    a1_x = lie.skew(acc_1 - ba)
    eye3 = jnp.eye(3, dtype=dtype)
    i_wdt = eye3 - w_x * dt

    f_pth = -0.25 * Rk @ a0_x * dt * dt - 0.25 * Rk1 @ a1_x @ i_wdt * dt * dt
    f_pba = -0.25 * (Rk + Rk1) * dt * dt
    f_pbg = 0.25 * (Rk1 @ a1_x) * dt * dt * dt
    f_vth = -0.5 * Rk @ a0_x * dt - 0.5 * Rk1 @ a1_x @ i_wdt * dt
    f_vba = -0.5 * (Rk + Rk1) * dt
    f_vbg = 0.5 * (Rk1 @ a1_x) * dt * dt
    z3 = jnp.zeros((3, 3), dtype)
    F = jnp.block(
        [
            [eye3, f_pth, eye3 * dt, f_pba, f_pbg],
            [z3, i_wdt, z3, z3, -eye3 * dt],
            [z3, f_vth, eye3, f_vba, f_vbg],
            [z3, z3, z3, eye3, z3],
            [z3, z3, z3, z3, eye3],
        ]
    )

    v_pa0 = 0.25 * Rk * dt * dt
    v_pth = -0.125 * (Rk1 @ a1_x) * dt * dt * dt  # 0.25 * R1 a1x dt^2 * 0.5dt, negated
    v_pa1 = 0.25 * Rk1 * dt * dt
    v_va0 = 0.5 * Rk * dt
    v_vth = -0.25 * (Rk1 @ a1_x) * dt * dt
    v_va1 = 0.5 * Rk1 * dt
    hdt = 0.5 * eye3 * dt
    V = jnp.block(
        [
            [v_pa0, v_pth, v_pa1, v_pth, z3, z3],
            [z3, hdt, z3, hdt, z3, z3],
            [v_va0, v_vth, v_va1, v_vth, z3, z3],
            [z3, z3, z3, z3, eye3 * dt, z3],
            [z3, z3, z3, z3, z3, eye3 * dt],
        ]
    )

    new_jac = F @ state.jacobian
    new_cov = F @ state.covariance @ F.T + (V * noise.diag18()[None, :]) @ V.T

    return state.replace(
        delta_p=new_dp,
        delta_q=new_dq,
        delta_v=new_dv,
        jacobian=new_jac,
        covariance=new_cov,
        sum_dt=state.sum_dt + dt,
        acc_0=jnp.asarray(acc_1, dtype),
        gyr_0=jnp.asarray(gyr_1, dtype),
    )


def preintegrate(
    state: PreintState, dts: jax.Array, accs: jax.Array, gyrs: jax.Array, noise: ImuNoise
) -> PreintState:
    """Integrate a buffer of samples: `lax.scan` of midpoint steps.

    `dts` (N,), `accs`/`gyrs` (N, 3). Padding entries must have dt == 0 but
    should repeat the last valid sample in accs/gyrs (a dt=0 step still
    overwrites acc_0/gyr_0).
    """

    def step(s, x):
        dt, acc, gyr = x
        return midpoint_step(s, dt, acc, gyr, noise), None

    state, _ = jax.lax.scan(step, state, (dts, accs, gyrs))
    return state


def repropagate(
    state: PreintState,
    dts: jax.Array,
    accs: jax.Array,
    gyrs: jax.Array,
    acc0: jax.Array,
    gyr0: jax.Array,
    new_ba: jax.Array,
    new_bg: jax.Array,
    noise: ImuNoise,
) -> PreintState:
    """`IntegrationBase::repropagate` (`integration_base.h:38-52`): reset the
    delta and re-run the buffer with new linearization biases."""
    fresh = preint_init(acc0, gyr0, new_ba, new_bg, state.delta_p.dtype)
    return preintegrate(fresh, dts, accs, gyrs, noise)


def preint_compose(a: PreintState, b: PreintState) -> PreintState:
    """Compose two consecutive preintegrations Δ(0→1) ∘ Δ(1→2) → Δ(0→2)
    (the `slideWindowNew` merge, `estimator.cpp:992-1001`, done on the
    integrated quantities instead of replaying raw samples):

        q02 = q01 ⊗ q12,  v02 = v01 + R01 v12,
        p02 = p01 + v01·Δt12 + R01 p12,

    with first-order composition of the bias Jacobians and covariance
    (error-state transition F maps δ1 errors into the composite)."""
    dt2 = b.sum_dt
    R01 = lie.quat_to_matrix(a.delta_q)
    p02 = a.delta_p + a.delta_v * dt2 + R01 @ b.delta_p
    v02 = a.delta_v + R01 @ b.delta_v
    q02 = lie.quat_normalize(lie.quat_multiply(a.delta_q, b.delta_q))

    # error-state transition of block a into the composite:
    #   δp02 = δp01 + dt2·δv01 − R01 [p12]× δθ01 (+ bias terms via J’s)
    #   δθ02 = R12ᵀ δθ01, δv02 = δv01 − R01 [v12]× δθ01
    eye = jnp.eye(3, dtype=a.delta_p.dtype)
    z = jnp.zeros((3, 3), a.delta_p.dtype)
    R12 = lie.quat_to_matrix(b.delta_q)
    Fa = jnp.block([
        [eye, -R01 @ lie.skew(b.delta_p), eye * dt2, z, z],
        [z, R12.T, z, z, z],
        [z, -R01 @ lie.skew(b.delta_v), eye, z, z],
        [z, z, z, eye, z],
        [z, z, z, z, eye],
    ])
    # block b enters rotated by R01 on p/v, identity on θ/bias
    Gb = jnp.block([
        [R01, z, z, z, z],
        [z, eye, z, z, z],
        [z, z, R01, z, z],
        [z, z, z, eye, z],
        [z, z, z, z, eye],
    ])
    cov = Fa @ a.covariance @ Fa.T + Gb @ b.covariance @ Gb.T
    jac = Fa @ a.jacobian + Gb @ b.jacobian
    return PreintState(
        delta_p=p02, delta_q=q02, delta_v=v02,
        jacobian=jac, covariance=cov,
        sum_dt=a.sum_dt + b.sum_dt,
        linearized_ba=a.linearized_ba, linearized_bg=a.linearized_bg,
        acc_0=b.acc_0, gyr_0=b.gyr_0,
    )


def bias_corrected_delta(state: PreintState, bai: jax.Array, bgi: jax.Array):
    """First-order bias-corrected (delta_p, delta_q, delta_v)
    (`integration_base.h:170-180`)."""
    dba = bai - state.linearized_ba
    dbg = bgi - state.linearized_bg
    J = state.jacobian
    dp = state.delta_p + J[O_P : O_P + 3, O_BA : O_BA + 3] @ dba + J[O_P : O_P + 3, O_BG : O_BG + 3] @ dbg
    dv = state.delta_v + J[O_V : O_V + 3, O_BA : O_BA + 3] @ dba + J[O_V : O_V + 3, O_BG : O_BG + 3] @ dbg
    dq = lie.quat_multiply(state.delta_q, lie.delta_q(J[O_R : O_R + 3, O_BG : O_BG + 3] @ dbg))
    return dp, dq, dv


def evaluate(
    state: PreintState,
    Pi, Qi, Vi, Bai, Bgi,
    Pj, Qj, Vj, Baj, Bgj,
    gravity: jax.Array,
) -> jax.Array:
    """15-vector preintegration residual (`integration_base.h:160-186`).

    `gravity` is the world-frame gravity vector G (typically [0, 0, 9.8x]).
    """
    dp, dq, dv = bias_corrected_delta(state, Bai, Bgi)
    sdt = state.sum_dt
    Qi_inv = lie.quat_conjugate(Qi)
    r_p = lie.quat_rotate(Qi_inv, 0.5 * gravity * sdt * sdt + Pj - Pi - Vi * sdt) - dp
    q_err = lie.quat_multiply(lie.quat_conjugate(dq), lie.quat_multiply(Qi_inv, Qj))
    r_q = 2.0 * q_err[1:4]
    r_v = lie.quat_rotate(Qi_inv, gravity * sdt + Vj - Vi) - dv
    return jnp.concatenate([r_p, r_q, r_v, Baj - Bai, Bgj - Bgi])


# ---------------------------------------------------------------------------
# Forward NavState propagation (the LIS fast path and VINS `predict`)
# ---------------------------------------------------------------------------

@struct.dataclass
class NavState:
    """World-frame navigation state (GTSAM NavState + bias equivalent)."""

    pos: jax.Array  # (3,)
    quat: jax.Array  # (4,) world-from-body
    vel: jax.Array  # (3,)
    ba: jax.Array  # (3,)
    bg: jax.Array  # (3,)


def navstate_identity(dtype=jnp.float32) -> NavState:
    z3 = jnp.zeros(3, dtype)
    return NavState(pos=z3, quat=lie.quat_identity(dtype), vel=z3, ba=z3, bg=z3)


def navstate_predict(
    state: NavState,
    dts: jax.Array,
    accs: jax.Array,
    gyrs: jax.Array,
    gravity_vec: jax.Array,
    prev_acc: jax.Array | None = None,
    prev_gyr: jax.Array | None = None,
) -> NavState:
    """Dead-reckon the NavState through an IMU buffer (midpoint rule), the
    JAX equivalent of `imuIntegratorImu_->integrateMeasurement` + `predict`
    (`imuPreintegration.cpp:494-499`) and the VINS-rate `predict`
    (`estimator_node.cpp:46-82`). Padding entries: dt == 0.

    `gravity_vec` is the world gravity acceleration as it appears in
    a_world = R (a_meas - ba) + g, i.e. typically (0, 0, -9.8) for a
    z-up world with accelerometers measuring specific force.

    Parallel-prefix form: a sequential `lax.scan` of N tiny steps is
    latency-bound on TPU (~27 us/step through the tunnel-attached chip).
    Quaternion normalization commutes exactly with the Hamilton product
    (norm multiplicativity), so composing the per-sample delta quaternions
    with one `associative_scan` and normalizing afterwards reproduces the
    per-step-normalized sequential recursion; velocities/positions then
    reduce to cumulative sums. Bit-level parity with the sequential oracle
    is tested (`tests/test_preintegration.py`).
    """
    prev_a = accs[0] if prev_acc is None else prev_acc
    prev_g = gyrs[0] if prev_gyr is None else prev_gyr

    # orientation chain: q_i = q0 * prod_{k<=i} delta_q(un_gyr_k dt_k)
    g_prev = jnp.concatenate([prev_g[None], gyrs[:-1]], axis=0)
    un_gyr = 0.5 * (g_prev + gyrs) - state.bg[None]
    dq = jax.vmap(lie.delta_q)(un_gyr * dts[:, None])  # (N, 4)
    qs = jax.lax.associative_scan(_quat_mul_batch, dq)
    qs = jax.vmap(lie.quat_multiply, (None, 0))(state.quat, qs)
    qs = qs / jnp.linalg.norm(qs, axis=-1, keepdims=True)  # (N, 4)
    q_with0 = jnp.concatenate([state.quat[None], qs], axis=0)  # (N+1, 4)

    # midpoint world acceleration: un_acc_i = (w_{i-1} + w_i)/2 with
    # w_i = R(q_i)(a_i - ba) + g and w_{-1} from (q0, prev_acc)
    a_meas = jnp.concatenate([prev_a[None], accs], axis=0) - state.ba[None]
    w = lie.quat_rotate(q_with0, a_meas) + gravity_vec[None]  # (N+1, 3)
    un_acc = 0.5 * (w[:-1] + w[1:])  # (N, 3)

    dv = un_acc * dts[:, None]
    v_cum = state.vel[None] + jnp.cumsum(dv, axis=0)  # v_i after sample i
    v_prev = jnp.concatenate([state.vel[None], v_cum[:-1]], axis=0)
    pos = state.pos + jnp.sum(
        v_prev * dts[:, None] + 0.5 * un_acc * (dts * dts)[:, None], axis=0
    )
    return state.replace(pos=pos, quat=qs[-1], vel=v_cum[-1])


def _quat_mul_batch(a, b):
    """Batched Hamilton product a*b over trailing axis 4."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ], axis=-1)


def navstate_predict_seq(
    state: NavState,
    dts: jax.Array,
    accs: jax.Array,
    gyrs: jax.Array,
    gravity_vec: jax.Array,
    prev_acc: jax.Array | None = None,
    prev_gyr: jax.Array | None = None,
) -> NavState:
    """Sequential `lax.scan` oracle for `navstate_predict` (the literal
    per-sample recursion of `imuPreintegration.cpp:494-499`); kept for the
    parity test and as documentation of the recursion being parallelized."""
    prev_a = accs[0] if prev_acc is None else prev_acc
    prev_g = gyrs[0] if prev_gyr is None else prev_gyr

    def step(carry, x):
        pos, quat, vel, pa, pg = carry
        dt, acc, gyr = x
        un_gyr = 0.5 * (pg + gyr) - state.bg
        new_q = lie.quat_normalize(lie.quat_multiply(quat, lie.delta_q(un_gyr * dt)))
        a0 = lie.quat_rotate(quat, pa - state.ba) + gravity_vec
        a1 = lie.quat_rotate(new_q, acc - state.ba) + gravity_vec
        un_acc = 0.5 * (a0 + a1)
        new_p = pos + vel * dt + 0.5 * un_acc * dt * dt
        new_v = vel + un_acc * dt
        return (new_p, new_q, new_v, acc, gyr), None

    (pos, quat, vel, _, _), _ = jax.lax.scan(
        step, (state.pos, state.quat, state.vel, prev_a, prev_g), (dts, accs, gyrs)
    )
    return state.replace(pos=pos, quat=quat, vel=vel)


def gyro_rotation_table(dts: jax.Array, gyrs: jax.Array) -> jax.Array:
    """Cumulative gyro-only rotation quaternions over a sample buffer — the
    deskew attitude table of `imageProjection.cpp:354-410` (imuDeskewInfo
    integrates raw angular velocity; biases ignored). Returns (N+1, 4): entry
    i is the rotation from buffer start to just after sample i-1.

    Computed as an associative scan over quaternion products: a sequential
    `lax.scan` of M tiny steps is latency-bound on TPU (~30 us/step through
    the whole pipeline), while the parallel prefix runs in log2(M) batched
    rounds."""
    dq = jax.vmap(lie.delta_q)(gyrs * dts[:, None])  # (N, 4) per-sample steps

    def mul(a, b):  # batched Hamilton product a*b (left-to-right order)
        aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
        bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
        return jnp.stack([
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ], axis=-1)

    qs = jax.lax.associative_scan(mul, dq)
    qs = qs / jnp.linalg.norm(qs, axis=-1, keepdims=True)
    q0 = lie.quat_identity(gyrs.dtype)
    return jnp.concatenate([q0[None], qs], axis=0)


def navstate_predict_np(pos, quat, vel, ba, bg, dts, accs, gyrs, gravity_vec):
    """Pure-NumPy `navstate_predict` for HOST-side glue (the fused
    pipeline's exchange-1 guess propagation and the pre-init lidar
    seeding, `estimator_node.cpp:218-245` / `initial_alignment.h:94-180`).
    These run per message on tiny sample windows; dispatching them to the
    device costs ~25 ms per committed transfer on the tunnel-attached TPU
    while the arithmetic itself is microseconds. Identical midpoint
    recursion (same quaternion convention, per-step normalization).
    Returns (pos, quat, vel) as float64 numpy."""
    import numpy as _np

    p = _np.asarray(pos, _np.float64).copy()
    q = _np.asarray(quat, _np.float64).copy()
    v = _np.asarray(vel, _np.float64).copy()
    ba = _np.asarray(ba, _np.float64)
    bg = _np.asarray(bg, _np.float64)
    g = _np.asarray(gravity_vec, _np.float64)
    dts = _np.asarray(dts, _np.float64)
    accs = _np.asarray(accs, _np.float64)
    gyrs = _np.asarray(gyrs, _np.float64)

    def rot(qq, x):
        w, xx, yy, zz = qq
        R = _np.array([
            [1 - 2 * (yy * yy + zz * zz), 2 * (xx * yy - w * zz), 2 * (xx * zz + w * yy)],
            [2 * (xx * yy + w * zz), 1 - 2 * (xx * xx + zz * zz), 2 * (yy * zz - w * xx)],
            [2 * (xx * zz - w * yy), 2 * (yy * zz + w * xx), 1 - 2 * (xx * xx + yy * yy)],
        ])
        return R @ x

    def qmul(a, b):
        aw, ax, ay, az = a
        bw, bx, by, bz = b
        return _np.array([
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ])

    pa, pg = accs[0] if len(accs) else _np.zeros(3), gyrs[0] if len(gyrs) else _np.zeros(3)
    for k in range(len(dts)):
        dt = dts[k]
        if dt <= 0:
            pa, pg = accs[k], gyrs[k]
            continue
        un_gyr = 0.5 * (pg + gyrs[k]) - bg
        half = un_gyr * dt * 0.5
        dq = _np.concatenate([[1.0], half])  # VINS small-angle delta_q
        q_new = qmul(q, dq)
        q_new = q_new / _np.linalg.norm(q_new)
        a0 = rot(q, pa - ba) + g
        a1 = rot(q_new, accs[k] - ba) + g
        un_acc = 0.5 * (a0 + a1)
        p = p + v * dt + 0.5 * un_acc * dt * dt
        v = v + un_acc * dt
        q = q_new
        pa, pg = accs[k], gyrs[k]
    return p, q, v


def predict_imu_rate_np(pos, quat, vel, ba, bg, dts, accs, gyrs, gravity_vec):
    """Per-sample variant of `navstate_predict_np`: the IMU-rate odometry
    stream (`imuPreintegration.cpp:479-549` `imuHandler` predict). Same
    midpoint recursion, but returns the FULL per-sample history
    (ps (N,3), qs (N,4) wxyz normalized, vs (N,3)) as float64 numpy — one
    row per input sample, including zero-dt pad rows (which repeat the
    previous state). Host-side on purpose: emitting a 200-500 Hz stream
    through per-sample device RPCs would be a tunnel-latency storm."""
    import numpy as _np

    p = _np.asarray(pos, _np.float64).copy()
    q = _np.asarray(quat, _np.float64).copy()
    q = q / _np.linalg.norm(q)
    v = _np.asarray(vel, _np.float64).copy()
    ba = _np.asarray(ba, _np.float64)
    bg = _np.asarray(bg, _np.float64)
    g = _np.asarray(gravity_vec, _np.float64)
    dts = _np.asarray(dts, _np.float64)
    accs = _np.asarray(accs, _np.float64)
    gyrs = _np.asarray(gyrs, _np.float64)

    def rot(qq, x):
        w, xx, yy, zz = qq
        R = _np.array([
            [1 - 2 * (yy * yy + zz * zz), 2 * (xx * yy - w * zz), 2 * (xx * zz + w * yy)],
            [2 * (xx * yy + w * zz), 1 - 2 * (xx * xx + zz * zz), 2 * (yy * zz - w * xx)],
            [2 * (xx * zz - w * yy), 2 * (yy * zz + w * xx), 1 - 2 * (xx * xx + yy * yy)],
        ])
        return R @ x

    def qmul(a, b):
        aw, ax, ay, az = a
        bw, bx, by, bz = b
        return _np.array([
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ])

    n = len(dts)
    ps = _np.zeros((n, 3))
    qs = _np.zeros((n, 4))
    vs = _np.zeros((n, 3))
    pa = accs[0] if len(accs) else _np.zeros(3)
    pg = gyrs[0] if len(gyrs) else _np.zeros(3)
    for k in range(n):
        dt = dts[k]
        if dt > 0:
            un_gyr = 0.5 * (pg + gyrs[k]) - bg
            dq = _np.concatenate([[1.0], un_gyr * dt * 0.5])
            q_new = qmul(q, dq)
            q_new = q_new / _np.linalg.norm(q_new)
            a0 = rot(q, pa - ba) + g
            a1 = rot(q_new, accs[k] - ba) + g
            un_acc = 0.5 * (a0 + a1)
            p = p + v * dt + 0.5 * un_acc * dt * dt
            v = v + un_acc * dt
            q = q_new
        ps[k], qs[k], vs[k] = p, q, v
        pa, pg = accs[k], gyrs[k]
    return ps, qs, vs
