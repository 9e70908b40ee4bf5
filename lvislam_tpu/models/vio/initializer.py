"""Visual-inertial initialization — the reference's bootstrap path B
(`estimator.cpp:273-413` initialStructure, `initial/initial_sfm.cpp`
GlobalSFM, `initial/initial_aligment.cpp` VisualIMUAlignment,
`initial/solve_5pts.cpp` MotionEstimator).

Stages, each a fixed-shape batched op:

1. `find_reference_frame`: the earliest window frame with >= 20 px mean
   parallax (30/460 in normalized units against the newest frame) and a
   valid essential-matrix relative pose (`relativePose`,
   `estimator.cpp:493-522`; `ops.triangulate.relative_pose`).
2. `global_sfm`: up-to-scale structure from motion over the window —
   alternating resection (batched PnP Gauss-Newton per frame) and
   intersection (batched two/multi-view triangulation), the TPU-friendly
   equivalent of the reference's PnP-chain + Ceres BA
   (`initial_sfm.cpp:117-315`).
3. `solve_gyro_bias`: LS over SfM-vs-preintegration rotation increments
   (`initial_aligment.cpp:3-36`) + repropagation.
4. `linear_alignment`: velocities, gravity, and metric scale from the
   preintegration deltas (`initial_aligment.cpp:124-209`, incl. the
   scale/100 conditioning trick); `refine_gravity` constrains ||g|| on the
   2-dof tangent basis x4 iterations (`:53-121`).
5. `apply_alignment`: rotate everything into the gravity-aligned world
   (yaw-zeroed via `lie.g2R`), scale positions, seed velocities/biases
   (`visualInitialAlign`, `estimator.cpp:416-491`).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...core import lie
from ...ops import ba, preintegration as pre, triangulate as tri
from . import feature_manager as fm


class SfmResult(NamedTuple):
    Qs: jax.Array  # (W+1, 4) camera rotations (world=frame l)
    Ts: jax.Array  # (W+1, 3) camera translations (world->cam convention R,t)
    points: jax.Array  # (F, 3) world points
    point_valid: jax.Array  # (F,)
    ok: jax.Array  # ()
    ref_frame: jax.Array  # () the l index


def find_reference_frame(table: fm.FeatureTable, window: int,
                         min_parallax: float = 30.0 / 460.0):
    """Per-candidate-frame mean parallax against the newest frame
    (`relativePose`, `estimator.cpp:493-522`). Returns (l, parallax_ok (W,))."""
    W = window
    newest = W
    both = table.obs_valid[:, :W] & table.obs_valid[:, newest:newest + 1] & (
        table.ids >= 0
    )[:, None]
    par = jnp.linalg.norm(
        table.obs[:, :W] - table.obs[:, newest:newest + 1], axis=-1
    )
    n = jnp.sum(both, axis=0)
    mean_par = jnp.sum(jnp.where(both, par, 0.0), axis=0) / jnp.maximum(n, 1)
    ok = (mean_par > min_parallax) & (n >= 20)
    l = jnp.argmax(ok)  # earliest qualifying frame
    return l, ok


def _pnp_gn(obs, valid, pts, q0, t0, iters: int = 10):
    """Single-frame pose GN: minimize reprojection of known 3D points.
    world->cam: x_c = R x_w + t."""

    def residual(x, q_base):
        q = lie.quat_multiply(q_base, lie.so3_exp_quat(x[:3]))
        Pc = lie.quat_rotate(q[None], pts) + x[3:6][None]
        proj = Pc[..., :2] / jnp.maximum(Pc[..., 2:3], 1e-3)
        w = (valid & (Pc[..., 2] > 0.1))[:, None]
        return jnp.where(w, proj - obs, 0.0).reshape(-1)

    def step(carry, _):
        x, qb = carry
        J = jax.jacfwd(residual)(x, qb)
        r = residual(x, qb)
        H = J.T @ J + 1e-6 * jnp.eye(6)
        return (x - jnp.linalg.solve(H, J.T @ r), qb), None

    x0 = jnp.concatenate([jnp.zeros(3, t0.dtype), t0])
    (x, _), _ = jax.lax.scan(step, (x0, q0), None, length=iters)
    q = lie.quat_normalize(lie.quat_multiply(q0, lie.so3_exp_quat(x[:3])))
    return q, x[3:6]


def _sfm_ba(Qs, Ts, X, pt_valid, obs, obs_valid, l, W, iters: int = 8):
    """Joint bundle adjustment over all camera {q, t} AND points — the
    reference's final full BA (`initial_sfm.cpp:233-315`, DENSE_SCHUR with
    frame-l rotation and the l/newest translations held constant as the
    scale/gauge anchor). Damped LM with accept/reject; world->cam
    convention (x_c = R x_w + t) as everywhere in this module."""
    F = X.shape[0]
    W1 = W + 1
    obs_ok = obs_valid & pt_valid[:, None]
    dt_f = Qs.dtype
    rot_free = (jnp.arange(W1) != l)[:, None].astype(dt_f)
    tr_free = ((jnp.arange(W1) != l) & (jnp.arange(W1) != W))[:, None].astype(dt_f)
    D = W1 * 6 + F * 3

    def residual(d):
        dq = d[: W1 * 3].reshape(W1, 3) * rot_free
        dtr = d[W1 * 3 : W1 * 6].reshape(W1, 3) * tr_free
        dX = d[W1 * 6 :].reshape(F, 3) * pt_valid[:, None]
        q = jax.vmap(
            lambda qk, xk: lie.quat_multiply(qk, lie.so3_exp_quat(xk))
        )(Qs, dq)
        t = Ts + dtr
        Xn = X + dX
        Pc = lie.quat_rotate(q[None, :, :], Xn[:, None, :]) + t[None]
        # clamp-only depth handling: a point pushed to/behind the image
        # plane projects with a huge residual instead of being masked out
        # (a state-dependent mask would let LM "win" by hiding points)
        proj = Pc[..., :2] / jnp.maximum(Pc[..., 2:3], 1e-2)
        return jnp.where(obs_ok[..., None], proj - obs, 0.0).reshape(-1)

    def cost(d):
        r = residual(d)
        return jnp.sum(r * r)

    def it(carry, _):
        d0, lam, c0 = carry
        r, jvp = jax.linearize(residual, d0)
        J = jax.vmap(jvp)(jnp.eye(D, dtype=dt_f)).T
        diag = jnp.sum(J * J, axis=0)
        g = J.T @ (-r)
        H = J.T @ J + lam * jnp.diag(diag + 1e-8)
        step = jnp.linalg.solve(H, g)
        d1 = d0 + step
        c1 = cost(d1)
        # gain-ratio acceptance (Ceres' trust-region rho): the predicted
        # reduction of the damped quadratic model. Low-parallax points have
        # near-null ray directions — a plain c1<c0 test lets LM ride them
        # with enormous steps for noise-level gains (overfits structure).
        pred = jnp.dot(step, lam * (diag + 1e-8) * step + g)
        rho = (c0 - c1) / jnp.maximum(pred, 1e-12)
        acc = (c1 < c0) & (rho > 1e-2)
        return (
            jnp.where(acc, d1, d0),
            jnp.where(acc, jnp.maximum(lam / 3.0, 1e-5), lam * 10.0),
            jnp.where(acc, c1, c0),
        ), None

    d0 = jnp.zeros(D, dt_f)
    (d, _, c_fin), _ = jax.lax.scan(
        it, (d0, jnp.asarray(1e-3, dt_f), cost(d0)), None, length=iters
    )
    dq = d[: W1 * 3].reshape(W1, 3) * rot_free
    dtr = d[W1 * 3 : W1 * 6].reshape(W1, 3) * tr_free
    dX = d[W1 * 6 :].reshape(F, 3) * pt_valid[:, None]
    Qs2 = jax.vmap(
        lambda qk, xk: lie.quat_normalize(
            lie.quat_multiply(qk, lie.so3_exp_quat(xk)))
    )(Qs, dq)
    return Qs2, Ts + dtr, X + dX, c_fin


@partial(jax.jit, static_argnames=("window", "rounds", "ba_iters"))
def global_sfm(
    table: fm.FeatureTable,
    window: int,
    rounds: int = 4,
    ba_iters: int = 8,
) -> SfmResult:
    """Alternating resection/intersection SfM in the frame-l camera world,
    finished by a joint window BA over all {q, t} + points
    (`GlobalSFM::construct`, `initial_sfm.cpp:117-315`)."""
    W = window
    F = table.obs.shape[0]
    l, par_ok = find_reference_frame(table, window)
    sfm_ok = jnp.any(par_ok)

    feat_ok = table.ids >= 0
    obs_l = jnp.take_along_axis(
        table.obs, jnp.broadcast_to(l, (F, 1))[:, :, None].repeat(2, -1), axis=1
    )[:, 0]
    seen_l = jnp.take_along_axis(table.obs_valid, jnp.broadcast_to(l, (F, 1)), axis=1)[:, 0]
    obs_n = table.obs[:, W]
    seen_n = table.obs_valid[:, W]

    rel = tri.relative_pose(obs_l, obs_n, feat_ok & seen_l & seen_n)
    q_rel = lie.matrix_to_quat(rel.R)

    # initial poses: frame l = identity; newest = (R, t); others start at l
    Qs = jnp.tile(lie.quat_identity(), (W + 1, 1))
    Ts = jnp.zeros((W + 1, 3))
    Qs = Qs.at[W].set(q_rel)
    Ts = Ts.at[W].set(rel.t)

    # initial structure from l <-> newest
    P0 = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)
    P1 = jnp.concatenate([rel.R, rel.t[:, None]], axis=1)
    X0 = tri.triangulate_two_view(P0, P1, obs_l, obs_n)
    pt_valid = feat_ok & seen_l & seen_n & (X0[..., 2] > 0.1)
    X = jnp.where(pt_valid[:, None], X0, 0.0)

    def one_round(carry, _):
        Qs, Ts, X, pt_valid = carry

        # resection: every frame PnP against current structure
        def pnp_frame(k):
            q, t = _pnp_gn(
                table.obs[:, k], table.obs_valid[:, k] & pt_valid, X,
                Qs[k], Ts[k],
            )
            return q, t

        qs, ts = jax.vmap(pnp_frame)(jnp.arange(W + 1))
        # keep frame l pinned at identity (gauge)
        qs = qs.at[l].set(lie.quat_identity())
        ts = ts.at[l].set(jnp.zeros(3))

        # intersection: multi-view triangulation of every feature
        Rs = jax.vmap(lie.quat_to_matrix)(qs)

        def tri_feat(obsk, validk):
            pt, _ = tri.triangulate_multiview(Rs, ts, obsk, validk)
            return pt

        Xn = jax.vmap(tri_feat)(table.obs, table.obs_valid & feat_ok[:, None])
        nview = jnp.sum(table.obs_valid & feat_ok[:, None], axis=1)
        # cheirality in the anchor frame l
        Xl = jnp.einsum("ij,fj->fi", Rs[l], Xn) + ts[l][None]
        good = feat_ok & (nview >= 2) & (Xl[:, 2] > 0.1) & jnp.all(
            jnp.isfinite(Xn), axis=1
        )
        Xn = jnp.where(good[:, None], Xn, 0.0)
        return (qs, ts, Xn, good), None

    (Qs, Ts, X, pt_valid), _ = jax.lax.scan(
        one_round, (Qs, Ts, X, pt_valid), None, length=rounds
    )
    # final joint BA over all {q, t} + points (`initial_sfm.cpp:233-315`)
    if ba_iters > 0:
        Qs, Ts, X, _ = _sfm_ba(
            Qs, Ts, X, pt_valid, table.obs,
            table.obs_valid & feat_ok[:, None], l, W, iters=ba_iters,
        )
        # re-check cheirality in the anchor frame after the BA moved structure
        Rl = lie.quat_to_matrix(Qs[l])
        Xl = jnp.einsum("ij,fj->fi", Rl, X) + Ts[l][None]
        pt_valid = pt_valid & (Xl[:, 2] > 0.1) & jnp.all(
            jnp.isfinite(X), axis=1)
        X = jnp.where(pt_valid[:, None], X, 0.0)
    ok = sfm_ok & rel.ok & (jnp.sum(pt_valid) > 20)
    return SfmResult(Qs=Qs, Ts=Ts, points=X, point_valid=pt_valid, ok=ok,
                     ref_frame=l)


# ---------------------------------------------------------------------------
# Visual-IMU alignment (`initial_aligment.cpp`)
# ---------------------------------------------------------------------------

def solve_gyro_bias(q_cam: jax.Array, pints: pre.PreintState, qic: jax.Array,
                    window: int):
    """LS gyro bias from rotation increments (`solveGyroscopeBias`,
    `initial_aligment.cpp:3-36`): for each pair, J^T J dbg = J^T 2*vec(
    q_preint^-1 * q_ij)."""
    W = window
    # body rotations from camera SfM rotations: q_wb = q_wc * qic^-1
    q_wb = jax.vmap(lambda q: lie.quat_multiply(q, lie.quat_conjugate(qic)))(q_cam)

    def one(k):
        st = jax.tree.map(lambda x: x[k], pints)
        q_ij = lie.quat_multiply(lie.quat_conjugate(q_wb[k]), q_wb[k + 1])
        J = st.jacobian[pre.O_R : pre.O_R + 3, pre.O_BG : pre.O_BG + 3]
        r = 2.0 * lie.quat_multiply(lie.quat_conjugate(st.delta_q), q_ij)[1:4]
        return J.T @ J, J.T @ r

    As, bs = jax.vmap(one)(jnp.arange(W))
    A = jnp.sum(As, axis=0) + 1e-8 * jnp.eye(3)
    b = jnp.sum(bs, axis=0)
    return jnp.linalg.solve(A, b)


def linear_alignment(
    Ps_cam: jax.Array,  # (W+1, 3) camera positions in the SfM frame (c0)
    Qs_body: jax.Array,  # (W+1, 4) body orientations in c0
    pints: pre.PreintState,
    tic: jax.Array,
    window: int,
    g_norm: float,
):
    """Velocities + gravity + scale (`LinearAlignment`,
    `initial_aligment.cpp:124-209`). State x = [v_0..v_W (3 each), g(3),
    s(1)]; returns (x, ok)."""
    W = window
    n_state = (W + 1) * 3 + 3 + 1

    def rows(k):
        st = jax.tree.map(lambda x: x[k], pints)
        dt = st.sum_dt
        Ri = lie.quat_to_matrix(Qs_body[k])
        Rj = lie.quat_to_matrix(Qs_body[k + 1])
        RiT = Ri.T
        # position row block (3, n_state) and velocity row block
        Ap = jnp.zeros((3, n_state))
        Ap = jax.lax.dynamic_update_slice(Ap, -dt * jnp.eye(3), (0, 3 * k))
        Ap = jax.lax.dynamic_update_slice(Ap, RiT * dt * dt / 2.0, (0, 3 * (W + 1)))
        Ap = jax.lax.dynamic_update_slice(
            Ap, (RiT @ (Ps_cam[k + 1] - Ps_cam[k]))[:, None] / 100.0,
            (0, 3 * (W + 1) + 3),
        )
        bp = st.delta_p + RiT @ Rj @ tic - tic
        Av = jnp.zeros((3, n_state))
        Av = jax.lax.dynamic_update_slice(Av, -jnp.eye(3), (0, 3 * k))
        Av = jax.lax.dynamic_update_slice(Av, RiT @ Rj, (0, 3 * (k + 1)))
        Av = jax.lax.dynamic_update_slice(Av, RiT * dt, (0, 3 * (W + 1)))
        bv = st.delta_v
        return jnp.concatenate([Ap, Av]), jnp.concatenate([bp, bv])

    A, b = jax.vmap(rows)(jnp.arange(W))
    A = A.reshape(-1, n_state)
    b = b.reshape(-1)
    H = A.T @ A * 1000.0 + 1e-8 * jnp.eye(n_state)
    x = jnp.linalg.solve(H, A.T @ b * 1000.0)
    s = x[-1] / 100.0
    g = x[3 * (W + 1) : 3 * (W + 1) + 3]
    ok = (s > 0.0) & (jnp.abs(jnp.linalg.norm(g) - g_norm) < 1.0)
    return x, s, g, ok


def visual_initialize(
    table: fm.FeatureTable,
    pints: pre.PreintState,
    imu_bufs: tuple,  # (dts (W,M), accs, gyrs) raw buffers for repropagation
    tic: jax.Array,
    qic: jax.Array,
    window: int,
    g_norm: float,
    noise: pre.ImuNoise,
):
    """The full visual bootstrap (`initialStructure` path B +
    `visualInitialAlign`, `estimator.cpp:273-491`): SfM -> gyro bias ->
    repropagate -> linear alignment -> gravity refinement -> rotate/scale
    the window into the gravity-aligned (yaw-zeroed) world.

    Returns (Ps, Qs, Vs, Bgs, pints, ok): body states for frames 0..W with
    frame-0 position at the origin."""
    W = window
    sfm = global_sfm(table, W)

    # camera poses in the SfM (frame-l) world: x_c = R x_w + t
    Rwc = jax.vmap(lambda q: lie.quat_to_matrix(q).T)(sfm.Qs)  # cam->world
    q_wc = jax.vmap(lie.matrix_to_quat)(Rwc)
    p_c = -jnp.einsum("kij,kj->ki", Rwc, sfm.Ts)  # camera centers

    # body orientations and gyro bias
    bg = solve_gyro_bias(q_wc, pints, qic, W)

    d, a, g_ = imu_bufs

    def reprop(k):
        fresh = pre.preint_init(a[k, 0], g_[k, 0], jnp.zeros(3, bg.dtype), bg)
        return pre.preintegrate(fresh, d[k], a[k], g_[k], noise)

    pints2 = jax.vmap(reprop)(jnp.arange(W))

    q_wb = jax.vmap(lambda q: lie.quat_multiply(q, lie.quat_conjugate(qic)))(q_wc)
    x, s, g0, lin_ok = linear_alignment(p_c, q_wb, pints2, tic, W, g_norm)
    g_ref, x2, s2 = refine_gravity(p_c, q_wb, pints2, tic, W, g_norm, g0)

    # rotate the SfM world so the estimated gravity-direction G maps to +z
    # with zero yaw (`visualInitialAlign`, `estimator.cpp:416-491`)
    R0 = lie.g2R(g_ref)
    q0 = lie.matrix_to_quat(R0)

    # body positions: p_b = s·p_cam - R_wb·tic, then shift frame 0 to origin
    Rb = jax.vmap(lie.quat_to_matrix)(q_wb)
    p_b = s2 * p_c - jnp.einsum("kij,j->ki", Rb, tic)
    p_b = p_b - p_b[0:1]
    # velocities: x2 layout [v_0..v_W (body-frame), dg(2), s]
    v_body = x2[: (W + 1) * 3].reshape(W + 1, 3)
    v_w = jnp.einsum("kij,kj->ki", Rb, v_body)

    Ps = jnp.einsum("ij,kj->ki", R0, p_b)
    Vs = jnp.einsum("ij,kj->ki", R0, v_w)
    Qs = jax.vmap(lambda q: lie.quat_normalize(lie.quat_multiply(q0, q)))(q_wb)
    Bgs = jnp.tile(bg[None], (W + 1, 1))

    ok = sfm.ok & lin_ok & (s2 > 0.01)
    return Ps, Qs, Vs, Bgs, pints2, ok


def refine_gravity(
    Ps_cam, Qs_body, pints, tic, window: int, g_norm: float, g0: jax.Array,
    iters: int = 4,
):
    """Tangent-basis gravity refinement (`RefineGravity`,
    `initial_aligment.cpp:53-121`): g = g_norm*ĝ + w1 b1 + w2 b2."""
    W = window
    n_state = (W + 1) * 3 + 2 + 1

    def basis(g):
        a = g / jnp.linalg.norm(g)
        tmp = jnp.array([0.0, 0.0, 1.0])
        tmp = jnp.where(jnp.abs(a[2]) > 0.9, jnp.array([1.0, 0.0, 0.0]), tmp)
        b = tmp - a * (a @ tmp)
        b = b / jnp.linalg.norm(b)
        c = jnp.cross(a, b)
        return jnp.stack([b, c], axis=1)  # (3, 2)

    def one_iter(g0, _):
        lxly = basis(g0)
        gdir = g0 / jnp.linalg.norm(g0) * g_norm

        def rows(k):
            st = jax.tree.map(lambda x: x[k], pints)
            dt = st.sum_dt
            Ri = lie.quat_to_matrix(Qs_body[k])
            Rj = lie.quat_to_matrix(Qs_body[k + 1])
            RiT = Ri.T
            Ap = jnp.zeros((3, n_state))
            Ap = jax.lax.dynamic_update_slice(Ap, -dt * jnp.eye(3), (0, 3 * k))
            Ap = jax.lax.dynamic_update_slice(Ap, RiT @ lxly * dt * dt / 2.0, (0, 3 * (W + 1)))
            Ap = jax.lax.dynamic_update_slice(
                Ap, (RiT @ (Ps_cam[k + 1] - Ps_cam[k]))[:, None] / 100.0,
                (0, 3 * (W + 1) + 2),
            )
            bp = st.delta_p + RiT @ Rj @ tic - tic - RiT @ gdir * dt * dt / 2.0
            Av = jnp.zeros((3, n_state))
            Av = jax.lax.dynamic_update_slice(Av, -jnp.eye(3), (0, 3 * k))
            Av = jax.lax.dynamic_update_slice(Av, RiT @ Rj, (0, 3 * (k + 1)))
            Av = jax.lax.dynamic_update_slice(Av, RiT @ lxly * dt, (0, 3 * (W + 1)))
            bv = st.delta_v - RiT @ gdir * dt
            return jnp.concatenate([Ap, Av]), jnp.concatenate([bp, bv])

        A, b = jax.vmap(rows)(jnp.arange(W))
        A = A.reshape(-1, n_state)
        b = b.reshape(-1)
        H = A.T @ A * 1000.0 + 1e-8 * jnp.eye(n_state)
        x = jnp.linalg.solve(H, A.T @ b * 1000.0)
        dg = x[3 * (W + 1) : 3 * (W + 1) + 2]
        g_new = gdir + lxly @ dg
        return g_new, x

    g, xs = jax.lax.scan(one_iter, g0, None, length=iters)
    x = jax.tree.map(lambda a: a[-1], xs)
    s = x[-1] / 100.0
    return g, x, s
