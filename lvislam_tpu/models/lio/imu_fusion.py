"""IMU-rate odometry fusion — the `IMUPreintegration` + `TransformFusion`
node pair (`lidar_odometry/src/imuPreintegration.cpp`).

The reference runs a tiny GTSAM iSAM2 over (pose, velocity, bias) keys: per
lidar correction it adds an ImuFactor + bias BetweenFactor + lidar-pose
prior, solves, and resets the graph every 100 keys with marginal-covariance
carryover (`imuPreintegration.cpp:342-371`). That architecture is a CPU
workaround for growing graphs. The TPU-native equivalent is an *exactly
marginalized* two-state fixed-lag smoother: one jitted Gauss-Newton over the
30-dof (previous, current) state pair with

- the carried 15x15 sqrt-information prior on the previous state (exact
  Schur marginalization each step — strictly tighter than the reference's
  reset-every-100 approximation),
- the 15-dim whitened midpoint-preintegration factor (`ops.preintegration`,
  bias random walk included in its covariance, the VINS IMUFactor form),
- the lidar pose prior with correctionNoise sigmas (0.05 rad / 0.1 m), or
  the degenerate fallback sigmas (all 1.0) (`imuPreintegration.cpp:222-243`).

Failure detection (|v| > 30, |b| > 1.0 -> reset, `:458-476`) and the
reset-id protocol (`:293-298`) are pure predicates on the state. The IMU-rate
predict path (`imuHandler`, `:479-549`) is `ops.preintegration.
navstate_predict` scanned over the sample buffer, and `TransformFusion`
(`:22-151`) is a pose composition on the latest map odometry.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...core import lie
from ...ops import preintegration as pre


@dataclasses.dataclass(frozen=True)
class FusionParams:
    imuAccNoise: float = 3.9939570888238808e-03
    imuGyrNoise: float = 1.5636343949698187e-03
    imuAccBiasN: float = 6.4356659353532566e-05
    imuGyrBiasN: float = 3.5640318696367613e-05
    imuGravity: float = 9.80511
    # prior sigmas (`imuPreintegration.cpp:232-236`)
    priorPoseSigma: float = 1e-2
    priorVelSigma: float = 1e4
    priorBiasSigma: float = 1e-3
    # lidar correction sigmas (`:237-241`)
    corrRotSigma: float = 0.05
    corrTransSigma: float = 0.1
    corrDegenerateSigma: float = 1.0
    # failure thresholds (`failureDetection`, `:458-476`)
    maxVelocity: float = 30.0
    maxBias: float = 1.0
    # lidar->IMU lever arm (`params_lidar.yaml` extrinsicTrans): the lidar
    # correction pose is composed with lidar2Imu before the smoother and the
    # published state composes back with imu2Lidar
    # (`imuPreintegration.cpp:200-203,313,402,509`). Zero on the shipped rig.
    extTrans: tuple = (0.0, 0.0, 0.0)


class FusionState(NamedTuple):
    # previous optimized IMU-frame state (the prior anchor)
    pos: jax.Array  # (3,)
    quat: jax.Array  # (4,)
    vel: jax.Array  # (3,)
    ba: jax.Array  # (3,)
    bg: jax.Array  # (3,)
    sqrt_info: jax.Array  # (15, 15) prior sqrt information (upper-tri-ish)
    initialized: jax.Array  # () bool
    failed: jax.Array  # () bool — set when failureDetection fired this step
    reset_id: jax.Array  # () int32 — imuPreintegrationResetId


def fusion_init(params: FusionParams, dtype=jnp.float32) -> FusionState:
    z3 = jnp.zeros(3, dtype)
    info = jnp.zeros(15, dtype)
    info = info.at[0:3].set(1.0 / params.priorPoseSigma)  # position rows
    info = info.at[3:6].set(1.0 / params.priorPoseSigma)  # rotation rows
    info = info.at[6:9].set(1.0 / params.priorVelSigma)
    info = info.at[9:15].set(1.0 / params.priorBiasSigma)
    return FusionState(
        pos=z3, quat=lie.quat_identity(dtype), vel=z3, ba=z3, bg=z3,
        sqrt_info=jnp.diag(info),
        initialized=jnp.array(False),
        failed=jnp.array(False),
        reset_id=jnp.int32(0),
    )


def _retract15(pos, quat, vel, ba, bg, d):
    """d = [dp(3), phi(3), dv(3), dba(3), dbg(3)]."""
    return (
        pos + d[0:3],
        lie.quat_multiply(quat, lie.so3_exp_quat(d[3:6])),
        vel + d[6:9],
        ba + d[9:12],
        bg + d[12:15],
    )


def _state_minus(pos, quat, vel, ba, bg, pos0, quat0, vel0, ba0, bg0):
    """x ⊖ x0 in the same tangent layout."""
    return jnp.concatenate([
        pos - pos0,
        lie.quat_log(lie.quat_multiply(lie.quat_conjugate(quat0), quat)),
        vel - vel0,
        ba - ba0,
        bg - bg0,
    ])


@partial(jax.jit, static_argnames=("params", "gn_iters"))
def fusion_correct(
    state: FusionState,
    dts: jax.Array,  # (N,) IMU sample dts since last correction (0 = pad)
    accs: jax.Array,  # (N, 3)
    gyrs: jax.Array,  # (N, 3)
    lidar_trans: jax.Array,  # (3,) lidar odometry position (IMU frame)
    lidar_quat: jax.Array,  # (4,)
    degenerate: jax.Array,  # () bool
    params: FusionParams,
    gn_iters: int = 4,
):
    """One `odometryHandler` correction (`imuPreintegration.cpp:272-456`).
    Returns (new_state, predicted NavState for the IMU-rate thread)."""
    dtype = state.pos.dtype
    noise = pre.ImuNoise.create(
        params.imuAccNoise, params.imuGyrNoise,
        params.imuAccBiasN, params.imuGyrBiasN, dtype,
    )
    G = jnp.array([0.0, 0.0, params.imuGravity], dtype)

    # preintegrate the window at the current bias linearization point
    pint0 = pre.preint_init(accs[0], gyrs[0], state.ba, state.bg, dtype)
    pint = pre.preintegrate(pint0, dts, accs, gyrs, noise)
    # whitening: sqrt information of the 15x15 preint covariance
    cov = pint.covariance + 1e-8 * jnp.eye(15, dtype=dtype)
    Lc = jnp.linalg.cholesky(cov)
    imu_sqrt_info = jax.scipy.linalg.solve_triangular(
        Lc, jnp.eye(15, dtype=dtype), lower=True
    )

    corr_sigma = jnp.where(
        degenerate,
        jnp.full(6, params.corrDegenerateSigma, dtype),
        jnp.concatenate([
            jnp.full(3, params.corrTransSigma, dtype),
            jnp.full(3, params.corrRotSigma, dtype),
        ]),
    )
    corr_w = 1.0 / corr_sigma

    # initial guess for the new state: IMU prediction
    nav0 = pre.NavState(pos=state.pos, quat=state.quat, vel=state.vel,
                        ba=state.ba, bg=state.bg)
    nav_pred = pre.navstate_predict(nav0, dts, accs, gyrs, -G)

    x0 = (state.pos, state.quat, state.vel, state.ba, state.bg)

    def residuals(d):
        d0, d1 = d[0:15], d[15:30]
        p0, q0, v0, ba0, bg0 = _retract15(*x0, d0)
        p1, q1, v1, ba1, bg1 = _retract15(
            nav_pred.pos, nav_pred.quat, nav_pred.vel, state.ba, state.bg, d1
        )
        r_prior = state.sqrt_info @ _state_minus(p0, q0, v0, ba0, bg0, *x0)
        r_imu = imu_sqrt_info @ pre.evaluate(
            pint, p0, q0, v0, ba0, bg0, p1, q1, v1, ba1, bg1, G
        )
        r_corr = corr_w * jnp.concatenate([
            p1 - lidar_trans,
            lie.quat_log(lie.quat_multiply(lie.quat_conjugate(lidar_quat), q1)),
        ])
        return jnp.concatenate([r_prior, r_imu, r_corr])

    # Square-root (QR) Gauss-Newton: forming J^T J in f32 wipes out the
    # low-weight lidar-correction rows next to the 1e4-weight whitened IMU
    # rows (SURVEY.md §7 hard part (d)); QR keeps full f32 accuracy.
    def gn_step(i, d):
        r = residuals(d)
        J = jax.jacfwd(residuals)(d)
        Q, R = jnp.linalg.qr(J)  # (36,30),(30,30)
        dx = jax.scipy.linalg.solve_triangular(
            R + 1e-8 * jnp.eye(30, dtype=dtype), -(Q.T @ r), lower=False
        )
        return d + dx

    d = jax.lax.fori_loop(0, gn_iters, gn_step, jnp.zeros(30, dtype))

    # Marginalization by QR elimination (square-root information filter):
    # with column order [x0 | x1], the trailing 15x15 block of R is the
    # exact sqrt information of the x1 marginal.
    J = jax.jacfwd(residuals)(d)
    _, Rfac = jnp.linalg.qr(J)
    new_sqrt_info = Rfac[15:30, 15:30]

    p1, q1, v1, ba1, bg1 = _retract15(
        nav_pred.pos, nav_pred.quat, nav_pred.vel, state.ba, state.bg, d[15:30]
    )
    q1 = lie.quat_normalize(q1)

    # failure detection (`:458-476`)
    failed = (
        (jnp.linalg.norm(v1) > params.maxVelocity)
        | (jnp.linalg.norm(ba1) > params.maxBias)
        | (jnp.linalg.norm(bg1) > params.maxBias)
    )

    fresh = fusion_init(params, dtype)
    new_state = FusionState(
        pos=jnp.where(failed, fresh.pos, p1),
        quat=jnp.where(failed, fresh.quat, q1),
        vel=jnp.where(failed, fresh.vel, v1),
        ba=jnp.where(failed, fresh.ba, ba1),
        bg=jnp.where(failed, fresh.bg, bg1),
        sqrt_info=jnp.where(failed, fresh.sqrt_info, new_sqrt_info),
        initialized=~failed,
        failed=failed,
        reset_id=state.reset_id + failed.astype(jnp.int32),
    )
    return new_state


@partial(jax.jit, static_argnames=("params",))
def fusion_initialize(
    state: FusionState, lidar_trans: jax.Array, lidar_quat: jax.Array,
    params: FusionParams,
):
    """System initialization at the first lidar correction
    (`imuPreintegration.cpp:301-339`)."""
    fresh = fusion_init(params, state.pos.dtype)
    return fresh._replace(
        pos=lidar_trans,
        quat=lidar_quat,
        initialized=jnp.array(True),
        reset_id=state.reset_id,
    )


@partial(jax.jit, static_argnames=("params",))
def predict_imu_rate(
    state: FusionState,
    dts: jax.Array,  # (N,)
    accs: jax.Array,
    gyrs: jax.Array,
    params: FusionParams,
):
    """IMU-rate odometry stream (`imuHandler` predict, `:494-499`): returns
    per-sample (pos (N,3), quat (N,4), vel (N,3)) dead-reckoned from the
    latest optimized state."""
    G = jnp.array([0.0, 0.0, -params.imuGravity], state.pos.dtype)

    def step(carry, x):
        pos, quat, vel, pa, pg = carry
        dt, acc, gyr = x
        un_gyr = 0.5 * (pg + gyr) - state.bg
        q1 = lie.quat_normalize(lie.quat_multiply(quat, lie.delta_q(un_gyr * dt)))
        a0 = lie.quat_rotate(quat, pa - state.ba) + G
        a1 = lie.quat_rotate(q1, acc - state.ba) + G
        un_acc = 0.5 * (a0 + a1)
        p1 = pos + vel * dt + 0.5 * un_acc * dt * dt
        v1 = vel + un_acc * dt
        return (p1, q1, v1, acc, gyr), (p1, q1, v1)

    init = (state.pos, state.quat, state.vel, accs[0], gyrs[0])
    _, (ps, qs, vs) = jax.lax.scan(step, init, (dts, accs, gyrs))
    return ps, qs, vs


def transform_fusion(
    lidar_odom_trans, lidar_odom_quat,
    imu_odom_front_trans, imu_odom_front_quat,
    imu_odom_back_trans, imu_odom_back_quat,
):
    """`TransformFusion::imuOdometryHandler` (`imuPreintegration.cpp:86-150`):
    latest map odometry ∘ (imu odom at map time)⁻¹ ∘ (latest imu odom)."""
    ti, qi = lie.se3_relative(
        imu_odom_front_trans, imu_odom_front_quat,
        imu_odom_back_trans, imu_odom_back_quat,
    )
    return lie.se3_compose(lidar_odom_trans, lidar_odom_quat, ti, qi)
