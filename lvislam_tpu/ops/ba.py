"""Sliding-window visual-inertial bundle adjustment + Schur/QR
marginalization.

TPU re-design of the reference's Ceres problem (`estimator.cpp:696-977`
`optimization`) and its marginalization machinery
(`factor/marginalization_factor.{h,cpp}`):

- parameter blocks = (W+1) poses + (W+1) speed/bias + extrinsic + td +
  per-feature inverse depths, flattened into one tangent vector
  delta = [frames(15 each) | extr(6) | td(1) | depths(F)];
- residual blocks = marginalization prior (linear FEJ replay,
  `marginalization_factor.cpp:363-375`), 10 whitened IMU preintegration
  factors (`factor/imu_factor.h` via `ops.preintegration.evaluate`),
  and all projection factors with td compensation
  (`factor/projection_td_factor.cpp`), sqrt_info = FOCAL_LENGTH/1.5
  (`estimator.cpp:17-18`); lidar-depth features held constant
  (`estimator.cpp:774-785`);
- the solver is damped Gauss-Newton with a QR solve per iteration —
  square-root form for f32 safety (SURVEY.md §7 hard part (d)); Ceres'
  DENSE_SCHUR elimination is unnecessary at this size on TPU: the full
  dense (172+F)-dim system solves in microseconds;
- marginalization is QR elimination (SRIF): stack the factors touching the
  dropped states, order columns [dropped | kept], one QR -> the trailing
  triangle is the exact new prior with first-estimate Jacobians.

Everything is fixed-shape: invalid frames/features carry zero weights.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import lie
from . import preintegration as pre


@dataclasses.dataclass(frozen=True)
class BAConfig:
    window: int = 10
    max_features: int = 512
    focal: float = 460.0  # FOCAL_LENGTH for sqrt_info
    iterations: int = 8
    damping: float = 1e-5
    estimate_td: bool = True
    estimate_extrinsic: bool = False
    cauchy_c: float = 1.0  # CauchyLoss(1.0) on projection factors
    # (`estimator.cpp:705` loss_function = new ceres::CauchyLoss(1.0))
    # "qr": augmented-QR LM step (numerically safest). "cholesky": damped
    # normal equations with Jacobi column equilibration — ~4x faster on TPU
    # (jnp.linalg.qr is row-panel-bound there) and what the reference's
    # Ceres effectively does, in f32 here; the VINS noise weights span a
    # mild dynamic range so the equilibrated Gram matrix stays
    # well-conditioned (solver parity is tested). "schur": cholesky plus
    # analytic elimination of the inverse depths — the actual DENSE_SCHUR
    # structure of the reference (`estimator.cpp:798` DENSE_SCHUR): each
    # depth column hits only its own feature's projection rows, so the
    # whole depth Jacobian block is ONE jvp and the dense solve shrinks
    # from d_total to d_state dims.
    solver: str = "qr"
    # early termination: stop iterating once an ACCEPTED step improves the
    # cost by less than ftol*cost — Ceres' function_tolerance (default 1e-6),
    # which the reference's solver budget relies on (`estimator.cpp:806`
    # max_solver_time_in_seconds cuts iterations the same way). 0.0 disables
    # (always run `iterations` steps). In steady state the window usually
    # converges in 1-2 LM steps, so this is also the main BA latency lever.
    ftol: float = 1e-6

    @property
    def d_state(self) -> int:
        return (self.window + 1) * 15 + 6 + 1

    @property
    def d_total(self) -> int:
        return self.d_state + self.max_features


class WindowState(NamedTuple):
    """The estimator's window variables (`estimator.h:77-127`)."""

    Ps: jax.Array  # (W+1, 3)
    Qs: jax.Array  # (W+1, 4)
    Vs: jax.Array  # (W+1, 3)
    Bas: jax.Array  # (W+1, 3)
    Bgs: jax.Array  # (W+1, 3)
    tic: jax.Array  # (3,)
    qic: jax.Array  # (4,)
    td: jax.Array  # ()


class Prior(NamedTuple):
    """Linear FEJ prior: r(x) = r0 + J0 @ (x [-] x_bar), where x_bar is the
    linearization (first-estimate) point — the reference keeps the same
    anchor via `keep_block_data` (`marginalization_factor.cpp:363-375`)."""

    J: jax.Array  # (Dp, d_state)
    r: jax.Array  # (Dp,)
    ws_bar: "WindowState"  # linearization point


def _zero_ws(cfg: BAConfig, dtype=jnp.float32) -> "WindowState":
    W1 = cfg.window + 1
    return WindowState(
        Ps=jnp.zeros((W1, 3), dtype),
        Qs=jnp.tile(jnp.array([1.0, 0, 0, 0], dtype), (W1, 1)),
        Vs=jnp.zeros((W1, 3), dtype),
        Bas=jnp.zeros((W1, 3), dtype),
        Bgs=jnp.zeros((W1, 3), dtype),
        tic=jnp.zeros(3, dtype),
        qic=jnp.array([1.0, 0, 0, 0], dtype),
        td=jnp.zeros((), dtype),
    )


def empty_prior(cfg: BAConfig, dtype=jnp.float32) -> Prior:
    return Prior(
        J=jnp.zeros((cfg.d_state, cfg.d_state), dtype),
        r=jnp.zeros(cfg.d_state, dtype),
        ws_bar=_zero_ws(cfg, dtype),
    )


def state_minus(ws: "WindowState", ws_bar: "WindowState", cfg: BAConfig) -> jax.Array:
    """Tangent difference x [-] x_bar in the delta layout."""
    dq = jax.vmap(
        lambda qb, q: lie.quat_log(lie.quat_multiply(lie.quat_conjugate(qb), q))
    )(ws_bar.Qs, ws.Qs)
    frames = jnp.concatenate(
        [ws.Ps - ws_bar.Ps, dq, ws.Vs - ws_bar.Vs,
         ws.Bas - ws_bar.Bas, ws.Bgs - ws_bar.Bgs], axis=-1
    ).reshape(-1)
    dex = jnp.concatenate([
        ws.tic - ws_bar.tic,
        lie.quat_log(lie.quat_multiply(lie.quat_conjugate(ws_bar.qic), ws.qic)),
    ])
    return jnp.concatenate([frames, dex, (ws.td - ws_bar.td)[None]])


def _retract_window(ws: WindowState, d_state: jax.Array, cfg: BAConfig) -> WindowState:
    W1 = cfg.window + 1
    dd = d_state[: W1 * 15].reshape(W1, 15)
    Ps = ws.Ps + dd[:, 0:3]
    Qs = jax.vmap(lambda q, phi: lie.quat_multiply(q, lie.so3_exp_quat(phi)))(
        ws.Qs, dd[:, 3:6]
    )
    Vs = ws.Vs + dd[:, 6:9]
    Bas = ws.Bas + dd[:, 9:12]
    Bgs = ws.Bgs + dd[:, 12:15]
    ex = d_state[W1 * 15 : W1 * 15 + 6]
    tic = ws.tic + ex[0:3] * (1.0 if cfg.estimate_extrinsic else 0.0)
    qic = lie.quat_multiply(
        ws.qic, lie.so3_exp_quat(ex[3:6] * (1.0 if cfg.estimate_extrinsic else 0.0))
    )
    td = ws.td + d_state[W1 * 15 + 6] * (1.0 if cfg.estimate_td else 0.0)
    return WindowState(Ps=Ps, Qs=Qs, Vs=Vs, Bas=Bas, Bgs=Bgs, tic=tic, qic=qic, td=td)


def projection_residuals(
    ws: WindowState,
    inv_depth: jax.Array,  # (F,)
    obs: jax.Array,  # (F, W+1, 2)
    vel: jax.Array,  # (F, W+1, 2)
    obs_valid: jax.Array,  # (F, W+1)
    start_frame: jax.Array,  # (F,)
    feat_valid: jax.Array,  # (F,)
    td0: jax.Array,  # () td at feature observation time (reference TD)
    cfg: BAConfig,
    rt: jax.Array | None = None,  # (F, W+1) rolling-shutter row times (s)
):
    """(F, W+1, 2) whitened projection residuals + mask. The reference's
    ProjectionTdFactor: observation in frame i un-projected by inv depth,
    moved through body+extrinsic chain into frame j, compared on the image
    plane; td shifts both observations along their velocities, plus the
    per-observation rolling-shutter row-readout time
    (`projection_td_factor.cpp:18-19,34-36`: td_i = td - td_i + TR/ROW·row)."""
    F, W1, _ = obs.shape
    dt_td = ws.td - td0

    # td- and row-time-corrected observations
    shift = dt_td if rt is None else dt_td + rt[..., None]
    obs_c = obs - vel * shift

    Ric = lie.quat_to_matrix(ws.qic)

    sf = jnp.clip(start_frame, 0, W1 - 1)
    obs_i = jnp.take_along_axis(obs_c, sf[:, None, None].repeat(2, -1), axis=1)[:, 0]
    depth = 1.0 / jnp.maximum(inv_depth, 1e-6)
    pts_cam_i = jnp.concatenate(
        [obs_i, jnp.ones((F, 1), obs.dtype)], axis=-1
    ) * depth[:, None]

    # camera i -> world
    Pi = ws.Ps[sf]
    Qi = ws.Qs[sf]
    pts_imu_i = lie.quat_rotate(ws.qic[None], pts_cam_i) + ws.tic[None]
    pts_w = lie.quat_rotate(Qi, pts_imu_i) + Pi

    # world -> camera j for all frames
    def to_frame(Pj, Qj):
        pts_imu_j = lie.quat_rotate(lie.quat_conjugate(Qj)[None], pts_w - Pj[None])
        return lie.quat_rotate(
            lie.quat_conjugate(ws.qic)[None], pts_imu_j - ws.tic[None]
        )

    pts_cam_j = jax.vmap(to_frame, in_axes=(0, 0), out_axes=1)(ws.Ps, ws.Qs)  # (F, W1, 3)
    zj = pts_cam_j[..., 2]
    proj = pts_cam_j[..., :2] / jnp.maximum(zj, 1e-3)[..., None]
    r = proj - obs_c

    anchor_ok = jnp.take_along_axis(obs_valid, sf[:, None], axis=1)[:, 0]
    mask = (
        obs_valid
        & feat_valid[:, None]
        & anchor_ok[:, None]
        & (inv_depth > 0)[:, None]
        & (jnp.arange(W1)[None, :] != start_frame[:, None])
    )
    sqrt_info = cfg.focal / 1.5
    r = jnp.where(mask[..., None], r * sqrt_info, 0.0)
    return r, mask


def imu_whiteners(pints: pre.PreintState, dtype=jnp.float32) -> jax.Array:
    """(W, 15, 15) inverse Cholesky factors of the preintegration
    covariances. State-independent: hoist out of the LM iteration so
    neither the repeated cost evaluations nor the Jacobian tangents
    differentiate through a batched 15x15 cholesky + triangular solve."""
    cov = pints.covariance + 1e-10 * jnp.eye(15, dtype=dtype)[None]
    L = jnp.linalg.cholesky(cov)
    eye = jnp.broadcast_to(jnp.eye(15, dtype=dtype), L.shape)
    return jax.scipy.linalg.solve_triangular(L, eye, lower=True)


def imu_residuals(ws: WindowState, pints: pre.PreintState, frame_valid: jax.Array,
                  gravity: jax.Array, cfg: BAConfig,
                  whiten: jax.Array | None = None):
    """(W, 15) whitened IMU residuals between consecutive frames.
    `whiten`: optional precomputed `imu_whiteners` (Linv; applied as a
    matmul — identical to the triangular solve up to fp rounding)."""
    W = cfg.window

    def one(k):
        st = jax.tree.map(lambda x: x[k], pints)
        r = pre.evaluate(
            st,
            ws.Ps[k], ws.Qs[k], ws.Vs[k], ws.Bas[k], ws.Bgs[k],
            ws.Ps[k + 1], ws.Qs[k + 1], ws.Vs[k + 1], ws.Bas[k + 1], ws.Bgs[k + 1],
            gravity,
        )
        if whiten is not None:
            return whiten[k] @ r
        cov = st.covariance + 1e-10 * jnp.eye(15, dtype=r.dtype)
        L = jnp.linalg.cholesky(cov)
        rw = jax.scipy.linalg.solve_triangular(L, r, lower=True)
        return rw

    rs = jax.vmap(one)(jnp.arange(W))
    return jnp.where(frame_valid[1:, None] & frame_valid[:-1, None], rs, 0.0)


def robust_weights(r_proj: jax.Array, mask: jax.Array, c: float) -> jax.Array:
    """IRLS weights for the Cauchy loss rho(s) = c^2 log(1 + s/c^2):
    w = sqrt(rho'(s)) = 1/sqrt(1 + s/c^2), per observation (F, W+1)."""
    s = jnp.sum(r_proj * r_proj, axis=-1)
    w = jax.lax.rsqrt(1.0 + s / (c * c))
    return jnp.where(mask, w, 1.0)


def full_residual(
    delta: jax.Array,
    ws: WindowState,
    inv_depth0: jax.Array,
    table_obs, table_vel, table_obs_valid, table_start, feat_valid, lidar_flag,
    pints: pre.PreintState,
    frame_valid: jax.Array,
    prior: Prior,
    gravity: jax.Array,
    td0: jax.Array,
    cfg: BAConfig,
    proj_weights: jax.Array | None = None,
    table_rt: jax.Array | None = None,
    imu_whiten: jax.Array | None = None,
):
    d_state = delta[: cfg.d_state]
    d_depth = delta[cfg.d_state :]
    ws2 = _retract_window(ws, d_state, cfg)
    # lidar-depth features constant (`estimator.cpp:774-785`)
    inv_depth = inv_depth0 + jnp.where(lidar_flag, 0.0, d_depth)

    r_prior = prior.r + prior.J @ state_minus(ws2, prior.ws_bar, cfg)
    r_imu = imu_residuals(
        ws2, pints, frame_valid, gravity, cfg, whiten=imu_whiten
    ).reshape(-1)
    r_proj, _ = projection_residuals(
        ws2, inv_depth, table_obs, table_vel, table_obs_valid,
        table_start, feat_valid, td0, cfg, rt=table_rt,
    )
    if proj_weights is not None:
        r_proj = r_proj * proj_weights[..., None]
    return jnp.concatenate([r_prior, r_imu, r_proj.reshape(-1)])


def _lm_accept(ws, ws2, inv_depth, inv2, lam, cost, w_proj, eval_cost, cfg, i):
    """Shared LM accept/reject tail for every solver branch: evaluate the
    candidate, keep it iff cost decreases, scale the damping, and flag
    convergence (Ceres function_tolerance: an ACCEPTED step improving the
    cost by < ftol*cost stops the loop — `estimator.cpp:806` bounds the
    solve the same way via max_solver_time_in_seconds)."""
    new_cost, w_new = eval_cost(ws2, inv2)
    accept = new_cost < cost
    ws_out = jax.tree.map(lambda a, b_: jnp.where(accept, b_, a), ws, ws2)
    inv_out = jnp.where(accept, inv2, inv_depth)
    lam_out = jnp.where(accept, jnp.maximum(lam / 3.0, 1e-7), lam * 10.0)
    cost_out = jnp.where(accept, new_cost, cost)
    w_out = jnp.where(accept, w_new, w_proj)
    done = accept & ((cost - new_cost) < cfg.ftol * cost) if cfg.ftol > 0.0 \
        else jnp.asarray(False)
    return (ws_out, inv_out, lam_out, cost_out, w_out, i + 1, done)


class BAResult(NamedTuple):
    ws: WindowState
    inv_depth: jax.Array
    final_cost: jax.Array


@partial(jax.jit, static_argnames=("cfg",))
def solve(
    ws: WindowState,
    inv_depth: jax.Array,
    table_obs, table_vel, table_obs_valid, table_start, feat_valid, lidar_flag,
    pints: pre.PreintState,
    frame_valid: jax.Array,
    prior: Prior,
    gravity: jax.Array,
    td0: jax.Array,
    cfg: BAConfig,
    table_rt: jax.Array | None = None,
) -> BAResult:
    """Damped GN with QR solves (the Ceres DOGLEG-timeboxed equivalent)."""

    D = cfg.d_total
    # state-independent whitening, hoisted out of every residual eval and
    # Jacobian tangent (a batched 15x15 cholesky + solve per sweep otherwise)
    Linv_imu = imu_whiteners(pints, dtype=ws.Ps.dtype)

    def eval_cost(ws_, inv_):
        # one projection sweep serves both the robust weights and the cost
        # (full_residual at d=0 would redo the identical sweep)
        r0_proj, pmask = projection_residuals(
            ws_, inv_, table_obs, table_vel, table_obs_valid,
            table_start, feat_valid, td0, cfg, rt=table_rt,
        )
        w = robust_weights(r0_proj, pmask, cfg.cauchy_c)
        r_prior = prior.r + prior.J @ state_minus(ws_, prior.ws_bar, cfg)
        r_imu = imu_residuals(
            ws_, pints, frame_valid, gravity, cfg, whiten=Linv_imu
        ).reshape(-1)
        r = jnp.concatenate(
            [r_prior, r_imu, (r0_proj * w[..., None]).reshape(-1)]
        )
        return jnp.sum(r * r), w

    def it(carry):
        """Adaptive Levenberg-Marquardt step (the Ceres DOGLEG-timeboxed
        equivalent): reject cost-increasing steps, scale the damping.

        The robust weights ride in the carry: the weights at the incoming
        state are exactly what the previous iteration's accept/reject
        evaluation already computed (accepted candidate or unchanged
        state), so re-deriving them here would be a redundant full
        projection-residual sweep."""
        ws, inv_depth, lam, cost, w_proj, i, _ = carry

        def res(d):
            return full_residual(
                d, ws, inv_depth, table_obs, table_vel, table_obs_valid,
                table_start, feat_valid, lidar_flag, pints, frame_valid,
                prior, gravity, td0, cfg, proj_weights=w_proj,
                table_rt=table_rt, imu_whiten=Linv_imu,
            )

        if cfg.solver == "schur":
            dt = ws.Ps.dtype
            S, Fn = cfg.d_state, cfg.max_features
            W1 = cfg.window + 1
            n_pre = S + cfg.window * 15  # prior + IMU rows precede proj rows

            # state-block Jacobian via linearize: ONE primal pass shared
            # with the residual readout, then S batched tangent passes
            r, jvp_s = jax.linearize(
                lambda d_s: res(jnp.concatenate([d_s, jnp.zeros(Fn, dt)])),
                jnp.zeros(S, dt),
            )
            J_s = jax.vmap(jvp_s)(jnp.eye(S, dtype=dt)).T  # (rows, S)
            # depth-block Jacobian: depth columns are row-disjoint (each
            # depth touches only its feature's projection rows), so J_d @ 1
            # recovers every nonzero entry — one jvp, no F-wide jacfwd
            _, Jd_rows = jax.jvp(
                lambda d_d: res(jnp.concatenate([jnp.zeros(S, dt), d_d])),
                (jnp.zeros(Fn, dt),), (jnp.ones(Fn, dt),),
            )
            Jd = Jd_rows[n_pre:].reshape(Fn, W1 * 2)
            Js_proj = J_s[n_pre:].reshape(Fn, W1 * 2, S)
            r_proj_rows = r[n_pre:].reshape(Fn, W1 * 2)

            # Jacobi equilibration of the state columns (as in "cholesky")
            col = jnp.linalg.norm(J_s, axis=0) + 1e-6
            s = 1.0 / col
            Js_sc = J_s * s[None, :]
            A = Js_sc.T @ Js_sc  # (S, S)
            g_s = Js_sc.T @ (-r)
            C = jnp.sum(Jd * Jd, axis=1)  # (Fn,) diagonal depth block
            B = jnp.einsum("fks,fk->sf", Js_proj * s[None, None, :], Jd)
            g_d = jnp.sum(Jd * (-r_proj_rows), axis=1)
            # LM damping: lam*I on the scaled state block; the depth block's
            # scaled damping is lam*C (its own column norm²), i.e. C*(1+lam)
            Cd = C * (1.0 + lam) + 1e-8
            Hs = A - (B / Cd[None, :]) @ B.T + (lam + 1e-7) * jnp.eye(S, dtype=dt)
            rhs = g_s - B @ (g_d / Cd)
            L = jnp.linalg.cholesky(Hs)
            y = jax.scipy.linalg.cho_solve((L, True), rhs)
            d_s = s * y
            d_d = (g_d - B.T @ y) / Cd
            d = jnp.concatenate([d_s, d_d])
            ws2 = _retract_window(ws, d[: cfg.d_state], cfg)
            inv2 = inv_depth + jnp.where(
                lidar_flag | (~feat_valid), 0.0, d[cfg.d_state :]
            )
            return _lm_accept(ws, ws2, inv_depth, inv2, lam, cost, w_proj,
                              eval_cost, cfg, i)

        r, jvp_fn = jax.linearize(res, jnp.zeros(D, ws.Ps.dtype))
        J = jax.vmap(jvp_fn)(jnp.eye(D, dtype=ws.Ps.dtype)).T
        col = jnp.linalg.norm(J, axis=0) + 1e-6
        if cfg.solver == "cholesky":
            # damped normal equations, Jacobi-equilibrated: with column
            # scaling S = diag(1/col), solve (S J^T J S + lam I) y = S J^T b
            s = 1.0 / col
            Js = J * s[None, :]
            H = Js.T @ Js + lam * jnp.eye(D, dtype=ws.Ps.dtype)
            g = Js.T @ (-r)
            L = jnp.linalg.cholesky(H + 1e-7 * jnp.eye(D, dtype=ws.Ps.dtype))
            y = jax.scipy.linalg.cho_solve((L, True), g)
            d = s * y
        else:
            # LM damping rows: sqrt(lam)*diag-scale per column, augmented QR
            A = jnp.concatenate(
                [J, jnp.sqrt(lam) * jnp.diag(col)], axis=0
            )
            b = jnp.concatenate([-r, jnp.zeros(D, ws.Ps.dtype)])
            Q, R = jnp.linalg.qr(A)
            d = jax.scipy.linalg.solve_triangular(
                R + 1e-8 * jnp.eye(D, dtype=ws.Ps.dtype), Q.T @ b, lower=False
            )
        ws2 = _retract_window(ws, d[: cfg.d_state], cfg)
        inv2 = inv_depth + jnp.where(lidar_flag | (~feat_valid), 0.0, d[cfg.d_state :])
        return _lm_accept(ws, ws2, inv_depth, inv2, lam, cost, w_proj,
                          eval_cost, cfg, i)

    cost0, w0 = eval_cost(ws, inv_depth)
    init = (ws, inv_depth, jnp.asarray(1e-4, ws.Ps.dtype), cost0, w0,
            jnp.int32(0), jnp.asarray(False))

    def cond(carry):
        return (carry[5] < cfg.iterations) & ~carry[6]

    (ws, inv_depth, _, final_cost, _, _, _) = jax.lax.while_loop(
        cond, it, init,
    )
    return BAResult(ws=ws, inv_depth=inv_depth, final_cost=final_cost)


# ---------------------------------------------------------------------------
# Marginalization (SRIF / QR elimination)
# ---------------------------------------------------------------------------

def _drop_perm(cfg: BAConfig, drop_frame: int):
    """Column permutation putting frame `drop_frame`'s 15 dims first within
    the state block."""
    d = cfg.d_state
    drop = jnp.arange(drop_frame * 15, (drop_frame + 1) * 15)
    keep = jnp.array(
        [i for i in range(d) if not (drop_frame * 15 <= i < (drop_frame + 1) * 15)]
    )
    return drop, keep


@partial(jax.jit, static_argnames=("cfg",))
def marginalize_old(
    ws: WindowState,
    inv_depth: jax.Array,
    table_obs, table_vel, table_obs_valid, table_start, feat_valid, lidar_flag,
    pints: pre.PreintState,
    frame_valid: jax.Array,
    prior: Prior,
    gravity: jax.Array,
    td0: jax.Array,
    cfg: BAConfig,
    table_rt: jax.Array | None = None,
) -> Prior:
    """MARGIN_OLD: eliminate frame 0 (and the depths of features anchored
    there) from [prior + IMU(0,1) + frame-0 projections]; returns the new
    prior over the SHIFTED window layout (old frame k+1 -> new frame k), new
    frame W unconstrained (`estimator.cpp:813-903` + Schur
    `marginalization_factor.cpp:266-290`)."""
    D = cfg.d_total
    anchored = feat_valid & (table_start == 0)

    # robust rescaling at the marginalization point (`marginalization_factor
    # .cpp:38-69` applies the loss to each block before Schur)
    r0_proj, pmask = projection_residuals(
        ws, inv_depth, table_obs, table_vel, table_obs_valid,
        table_start, anchored, td0, cfg, rt=table_rt,
    )
    w_proj = robust_weights(r0_proj, pmask, cfg.cauchy_c)

    def res(d):
        d_state = d[: cfg.d_state]
        d_depth = d[cfg.d_state :]
        ws2 = _retract_window(ws, d_state, cfg)
        inv2 = inv_depth + jnp.where(lidar_flag, 0.0, d_depth)
        r_prior = prior.r + prior.J @ state_minus(ws2, prior.ws_bar, cfg)
        # IMU factor 0->1 only
        r_imu = imu_residuals(ws2, pints, frame_valid, gravity, cfg)[0]
        # projections of frame-0 anchored features only
        r_proj, _ = projection_residuals(
            ws2, inv2, table_obs, table_vel, table_obs_valid,
            table_start, anchored, td0, cfg, rt=table_rt,
        )
        r_proj = r_proj * w_proj[..., None]
        return jnp.concatenate([r_prior, r_imu, r_proj.reshape(-1)])

    z = jnp.zeros(D, ws.Ps.dtype)
    r0 = res(z)
    J = jax.jacfwd(res)(z)

    # column order: [frame0 (15) | anchored depths (F) | kept state]
    # anchored-depth columns: zero out non-anchored depth columns (they do
    # not appear in these factors anyway) and keep them out of the output.
    J_f0 = J[:, 0:15]
    J_depth = J[:, cfg.d_state :] * anchored[None, :]
    J_keep = J[:, 15 : cfg.d_state]
    A = jnp.concatenate([J_f0, J_depth, J_keep], axis=1)
    n_drop = 15 + cfg.max_features
    # Rank-deficiency guard: unobserved dropped variables (padded feature
    # slots, depth columns of non-anchored features) are zero columns; a
    # singular R11 would let kept-variable constraints leak into the rows
    # being discarded. A tiny prior row per dropped variable keeps the
    # elimination well-posed without meaningfully informing the marginal.
    eps = jnp.asarray(1e-3, A.dtype)
    reg = jnp.concatenate(
        [eps * jnp.eye(n_drop, dtype=A.dtype),
         jnp.zeros((n_drop, A.shape[1] - n_drop), A.dtype)], axis=1
    )
    A = jnp.concatenate([A, reg], axis=0)
    r0a = jnp.concatenate([r0, jnp.zeros(n_drop, A.dtype)])
    Q, R = jnp.linalg.qr(A)
    c = Q.T @ r0a
    J_new = R[n_drop:, n_drop:]
    r_new = c[n_drop : n_drop + J_new.shape[0]]

    # shift window indices: kept state was [frames 1..W | extr | td]; the
    # new layout wants [frames 0..W-1 | (free frame W zeros) | extr | td]
    d_kept = cfg.d_state - 15
    Jp = jnp.zeros((cfg.d_state, cfg.d_state), ws.Ps.dtype)
    rp = jnp.zeros(cfg.d_state, ws.Ps.dtype)
    W = cfg.window
    # frames 1..W -> 0..W-1
    Jp = Jp.at[: d_kept, 0 : W * 15].set(J_new[:, 0 : W * 15])
    # extr + td columns
    Jp = Jp.at[: d_kept, (W + 1) * 15 :].set(J_new[:, W * 15 :])
    rp = rp.at[:d_kept].set(r_new)
    # linearization point: the current states relabeled to the post-slide
    # layout (old frame k+1 -> new frame k)
    roll = lambda x: jnp.concatenate([x[1:], x[-1:]], axis=0)
    ws_bar = ws._replace(
        Ps=roll(ws.Ps), Qs=roll(ws.Qs), Vs=roll(ws.Vs),
        Bas=roll(ws.Bas), Bgs=roll(ws.Bgs),
    )
    return Prior(J=Jp, r=rp, ws_bar=ws_bar)


@partial(jax.jit, static_argnames=("cfg",))
def marginalize_second_new(prior: Prior, cfg: BAConfig) -> Prior:
    """MARGIN_SECOND_NEW: drop pose/speedbias of frame W-1 from the prior
    only (`estimator.cpp:905-976`), then relabel frame W -> W-1."""
    W = cfg.window
    d = cfg.d_state
    drop_lo, drop_hi = (W - 1) * 15, W * 15
    # reorder columns [dropped | kept]
    idx_drop = jnp.arange(drop_lo, drop_hi)
    idx_keep = jnp.concatenate(
        [jnp.arange(0, drop_lo), jnp.arange(drop_hi, d)]
    )
    A = jnp.concatenate([prior.J[:, idx_drop], prior.J[:, idx_keep]], axis=1)
    eps = jnp.asarray(1e-3, A.dtype)
    reg = jnp.concatenate(
        [eps * jnp.eye(15, dtype=A.dtype),
         jnp.zeros((15, A.shape[1] - 15), A.dtype)], axis=1
    )
    A = jnp.concatenate([A, reg], axis=0)
    ra = jnp.concatenate([prior.r, jnp.zeros(15, A.dtype)])
    Q, R = jnp.linalg.qr(A)
    c = Q.T @ ra
    J_new = R[15:, 15:]
    r_new = c[15 : 15 + J_new.shape[0]]
    d_kept = d - 15
    Jp = jnp.zeros((d, d), prior.J.dtype)
    rp = jnp.zeros(d, prior.r.dtype)
    # kept layout was [frames 0..W-2 | frame W | extr | td]; relabel frame W
    # to slot W-1 (it replaces the dropped one)
    Jp = Jp.at[:d_kept, 0 : (W - 1) * 15].set(J_new[:, 0 : (W - 1) * 15])
    Jp = Jp.at[:d_kept, (W - 1) * 15 : W * 15].set(
        J_new[:, (W - 1) * 15 : W * 15]
    )
    Jp = Jp.at[:d_kept, (W + 1) * 15 :].set(J_new[:, W * 15 :])
    rp = rp.at[:d_kept].set(r_new)
    wb = prior.ws_bar
    put = lambda x: x.at[W - 1].set(x[W])
    ws_bar = wb._replace(
        Ps=put(wb.Ps), Qs=put(wb.Qs), Vs=put(wb.Vs),
        Bas=put(wb.Bas), Bgs=put(wb.Bgs),
    )
    return Prior(J=Jp, r=rp, ws_bar=ws_bar)
