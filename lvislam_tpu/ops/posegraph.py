"""Keyframe pose-graph solver — the TPU replacement for GTSAM iSAM2 in the
LIS back-end (`lidar_odometry/src/mapOptimization.cpp:1414-1613`).

The reference maintains an incremental Bayes tree (iSAM2, relinearize
threshold 0.1, `mapOptimization.cpp:156-159`) over keyframe poses with:
- a prior factor on pose 0 with variances (1e-2, 1e-2, pi^2 | 1e8, 1e8, 1e8)
  (`addOdomFactor`, `:1414-1431`),
- sequential BetweenFactors with variances (1e-6 rot | 1e-4 trans),
- GPS unary factors (`addGPSFactor`, `:1433-1507`),
- loop-closure BetweenFactors (`addLoopFactor`, `:1509-1527`).

iSAM2's incremental relinearization exists to make *CPU* solves cheap. On
TPU the economics flip: a full batched relinearize-all Gauss-Newton with a
matrix-free preconditioned-conjugate-gradient inner solve is one fused XLA
program over padded factor blocks — every factor's 6x12 Jacobian comes from
`vmap`'d forward-mode autodiff, the Hessian is never materialized, and the
block-Jacobi preconditioner is assembled with scatter-adds. At keyframe
rates (~Hz) this is far below real-time cost and gives the *batch* ML
estimate (what iSAM2 approximates).

Pose tangent convention: [phi(3), t(3)] with right rotation perturbation
q' = q (x) exp(phi), additive translation — rotation-first ordering matches
GTSAM's Pose3 tangent so the reference's noise vectors port verbatim.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import lie


class PoseGraph(NamedTuple):
    """Fixed-capacity factor-graph storage (all arrays padded)."""

    # nodes
    trans: jax.Array  # (K, 3)
    quat: jax.Array  # (K, 4)
    node_valid: jax.Array  # (K,)
    # between factors: i -> j with measured relative pose
    bf_i: jax.Array  # (F,) int32
    bf_j: jax.Array  # (F,)
    bf_trans: jax.Array  # (F, 3) measured t of T_i^-1 T_j
    bf_quat: jax.Array  # (F, 4)
    bf_sqrtw: jax.Array  # (F, 6) sqrt information diag [rot, trans]
    bf_valid: jax.Array  # (F,)
    # unary position (GPS) factors
    up_k: jax.Array  # (G,) int32 node
    up_pos: jax.Array  # (G, 3)
    up_sqrtw: jax.Array  # (G, 3)
    up_valid: jax.Array  # (G,)
    # prior factor on node 0
    prior_trans: jax.Array  # (3,)
    prior_quat: jax.Array  # (4,)
    prior_sqrtw: jax.Array  # (6,)


def empty_graph(max_nodes: int, max_between: int, max_unary: int, dtype=jnp.float32) -> PoseGraph:
    K, F, G = max_nodes, max_between, max_unary
    return PoseGraph(
        trans=jnp.zeros((K, 3), dtype),
        quat=jnp.tile(lie.quat_identity(dtype), (K, 1)),
        node_valid=jnp.zeros(K, bool),
        bf_i=jnp.zeros(F, jnp.int32),
        bf_j=jnp.zeros(F, jnp.int32),
        bf_trans=jnp.zeros((F, 3), dtype),
        bf_quat=jnp.tile(lie.quat_identity(dtype), (F, 1)),
        bf_sqrtw=jnp.zeros((F, 6), dtype),
        bf_valid=jnp.zeros(F, bool),
        up_k=jnp.zeros(G, jnp.int32),
        up_pos=jnp.zeros((G, 3), dtype),
        up_sqrtw=jnp.zeros((G, 3), dtype),
        up_valid=jnp.zeros(G, bool),
        prior_trans=jnp.zeros(3, dtype),
        prior_quat=lie.quat_identity(dtype),
        prior_sqrtw=jnp.zeros(6, dtype),
    )


# reference noise models (`mapOptimization.cpp:1418,1424`): sqrt information
# = 1/sigma, variances -> sqrt weights
PRIOR_SQRTW = tuple(1.0 / (v**0.5) for v in (1e-2, 1e-2, 9.8696044, 1e8, 1e8, 1e8))
ODOM_SQRTW = tuple(1.0 / (v**0.5) for v in (1e-6, 1e-6, 1e-6, 1e-4, 1e-4, 1e-4))


def _between_residual(ti, qi, tj, qj, t_m, q_m):
    """r = [Log(q_m^-1 (q_i^-1 q_j)), (R_i^T (t_j - t_i)) - t_m]."""
    qi_inv = lie.quat_conjugate(qi)
    q_ij = lie.quat_multiply(qi_inv, qj)
    t_ij = lie.quat_rotate(qi_inv, tj - ti)
    r_rot = lie.quat_log(lie.quat_multiply(lie.quat_conjugate(q_m), q_ij))
    return jnp.concatenate([r_rot, t_ij - t_m])


def _retract(t, q, delta):
    """Right-perturbation chart: delta = [phi, dt]."""
    return t + delta[3:6], lie.quat_multiply(q, lie.so3_exp_quat(delta[0:3]))


def _between_jac(ti, qi, tj, qj, t_m, q_m):
    """(6, 12) Jacobian of the between residual wrt [delta_i, delta_j]."""

    def f(d):
        ti2, qi2 = _retract(ti, qi, d[0:6])
        tj2, qj2 = _retract(tj, qj, d[6:12])
        return _between_residual(ti2, qi2, tj2, qj2, t_m, q_m)

    return jax.jacfwd(f)(jnp.zeros(12, ti.dtype))


def _prior_residual(t0, q0, t_m, q_m):
    r_rot = lie.quat_log(lie.quat_multiply(lie.quat_conjugate(q_m), q0))
    return jnp.concatenate([r_rot, t0 - t_m])


def _prior_jac(t0, q0, t_m, q_m):
    def f(d):
        t2, q2 = _retract(t0, q0, d)
        return _prior_residual(t2, q2, t_m, q_m)

    return jax.jacfwd(f)(jnp.zeros(6, t0.dtype))


class _Lin(NamedTuple):
    """Linearization: whitened residuals + Jacobians of all factor blocks."""

    bf_J: jax.Array  # (F, 6, 12)
    bf_r: jax.Array  # (F, 6)
    up_J: jax.Array  # (G, 3, 6)  == selection of dt block
    up_r: jax.Array  # (G, 3)
    pr_J: jax.Array  # (6, 6)
    pr_r: jax.Array  # (6,)


def _linearize(g: PoseGraph) -> _Lin:
    ti = g.trans[g.bf_i]
    qi = g.quat[g.bf_i]
    tj = g.trans[g.bf_j]
    qj = g.quat[g.bf_j]
    bf_r = jax.vmap(_between_residual)(ti, qi, tj, qj, g.bf_trans, g.bf_quat)
    bf_J = jax.vmap(_between_jac)(ti, qi, tj, qj, g.bf_trans, g.bf_quat)
    w = jnp.where(g.bf_valid[:, None], g.bf_sqrtw, 0.0)
    bf_r = bf_r * w
    bf_J = bf_J * w[:, :, None]

    # unary position factor: r = t_k - pos; Jacobian wrt delta = [0 | I]
    up_r = (g.trans[g.up_k] - g.up_pos) * jnp.where(
        g.up_valid[:, None], g.up_sqrtw, 0.0
    )
    G = g.up_k.shape[0]
    up_J = jnp.tile(
        jnp.concatenate([jnp.zeros((3, 3)), jnp.eye(3)], axis=1)[None], (G, 1, 1)
    ) * jnp.where(g.up_valid[:, None], g.up_sqrtw, 0.0)[:, :, None]

    pr_r = _prior_residual(g.trans[0], g.quat[0], g.prior_trans, g.prior_quat)
    pr_J = _prior_jac(g.trans[0], g.quat[0], g.prior_trans, g.prior_quat)
    pr_r = pr_r * g.prior_sqrtw
    pr_J = pr_J * g.prior_sqrtw[:, None]
    return _Lin(bf_J=bf_J, bf_r=bf_r, up_J=up_J, up_r=up_r, pr_J=pr_J, pr_r=pr_r)


def _gradient(g: PoseGraph, lin: _Lin) -> jax.Array:
    """-J^T r scattered per node, shape (K, 6)."""
    K = g.trans.shape[0]
    grad = jnp.zeros((K, 6), g.trans.dtype)
    gi = jnp.einsum("fab,fa->fb", lin.bf_J[:, :, 0:6], lin.bf_r)
    gj = jnp.einsum("fab,fa->fb", lin.bf_J[:, :, 6:12], lin.bf_r)
    grad = grad.at[g.bf_i].add(gi)
    grad = grad.at[g.bf_j].add(gj)
    grad = grad.at[g.up_k].add(jnp.einsum("gab,ga->gb", lin.up_J, lin.up_r))
    grad = grad.at[0].add(lin.pr_J.T @ lin.pr_r)
    return -grad


def _hvp(g: PoseGraph, lin: _Lin, v: jax.Array, damping: jax.Array) -> jax.Array:
    """(J^T J + damping·I) v, matrix-free."""
    vi = v[g.bf_i]
    vj = v[g.bf_j]
    Jv = jnp.einsum("fab,fb->fa", lin.bf_J[:, :, 0:6], vi) + jnp.einsum(
        "fab,fb->fa", lin.bf_J[:, :, 6:12], vj
    )
    out = jnp.zeros_like(v)
    out = out.at[g.bf_i].add(jnp.einsum("fab,fa->fb", lin.bf_J[:, :, 0:6], Jv))
    out = out.at[g.bf_j].add(jnp.einsum("fab,fa->fb", lin.bf_J[:, :, 6:12], Jv))
    uJv = jnp.einsum("gab,gb->ga", lin.up_J, v[g.up_k])
    out = out.at[g.up_k].add(jnp.einsum("gab,ga->gb", lin.up_J, uJv))
    out = out.at[0].add(lin.pr_J.T @ (lin.pr_J @ v[0]))
    return out + damping * v


def _block_precond(g: PoseGraph, lin: _Lin, damping: jax.Array) -> jax.Array:
    """Block-Jacobi preconditioner: per-node 6x6 inverse of H diagonal."""
    K = g.trans.shape[0]
    diag = jnp.zeros((K, 6, 6), g.trans.dtype)
    Ji = lin.bf_J[:, :, 0:6]
    Jj = lin.bf_J[:, :, 6:12]
    diag = diag.at[g.bf_i].add(jnp.einsum("fab,fac->fbc", Ji, Ji))
    diag = diag.at[g.bf_j].add(jnp.einsum("fab,fac->fbc", Jj, Jj))
    diag = diag.at[g.up_k].add(jnp.einsum("gab,gac->gbc", lin.up_J, lin.up_J))
    diag = diag.at[0].add(lin.pr_J.T @ lin.pr_J)
    diag = diag + (damping + 1e-6) * jnp.eye(6)
    return jnp.linalg.inv(diag)


def _pcg(g: PoseGraph, lin: _Lin, b: jax.Array, damping, iters: int) -> jax.Array:
    """Preconditioned CG for (J^T J + damping I) x = b, masked to valid nodes."""
    mask = g.node_valid[:, None].astype(b.dtype)
    Minv = _block_precond(g, lin, damping)

    def apply_M(r):
        return jnp.einsum("kab,kb->ka", Minv, r) * mask

    x = jnp.zeros_like(b)
    r = b * mask
    z = apply_M(r)
    p = z
    rz = jnp.sum(r * z)

    def body(i, carry):
        x, r, p, rz = carry
        Ap = _hvp(g, lin, p, damping) * mask
        pAp = jnp.sum(p * Ap)
        alpha = jnp.where(pAp > 1e-12, rz / pAp, 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = apply_M(r)
        rz_new = jnp.sum(r * z)
        beta = jnp.where(rz > 1e-12, rz_new / rz, 0.0)
        p = z + beta * p
        return x, r, p, rz_new

    x, _, _, _ = jax.lax.fori_loop(0, iters, body, (x, r, p, rz))
    return x


@partial(jax.jit, static_argnames=("gn_iters", "pcg_iters"))
def optimize(g: PoseGraph, gn_iters: int = 8, pcg_iters: int = 64, damping: float = 1e-4) -> PoseGraph:
    """Batch Gauss-Newton over the whole graph (the iSAM2 `update` +
    `calculateEstimate` equivalent; also covers the reference's
    update x5-on-loop behavior since we always fully relinearize)."""

    def body(i, g):
        lin = _linearize(g)
        b = _gradient(g, lin)
        dx = _pcg(g, lin, b, jnp.asarray(damping, g.trans.dtype), pcg_iters)
        dx = dx * g.node_valid[:, None]
        new_t = g.trans + dx[:, 3:6]
        new_q = jax.vmap(lambda q, phi: lie.quat_multiply(q, lie.so3_exp_quat(phi)))(
            g.quat, dx[:, 0:3]
        )
        new_q = lie.quat_normalize(new_q)
        keep = g.node_valid[:, None]
        return g._replace(
            trans=jnp.where(keep, new_t, g.trans),
            quat=jnp.where(keep, new_q, g.quat),
        )

    return jax.lax.fori_loop(0, gn_iters, body, g)


def marginal_position_variance(g: PoseGraph, node: jax.Array) -> jax.Array:
    """Approximate marginal position variances (diag x/y/z) of `node` — used
    by the GPS gate (`poseCovThreshold`, `mapOptimization.cpp:1443`). Uses
    the block-Jacobi approximation of the marginal (cheap, conservative)."""
    lin = _linearize(g)
    Minv = _block_precond(g, lin, jnp.asarray(0.0, g.trans.dtype))
    cov = Minv[node]
    return jnp.stack([cov[3, 3], cov[4, 4], cov[5, 5]])


def total_error(g: PoseGraph) -> jax.Array:
    lin = _linearize(g)
    return (
        jnp.sum(lin.bf_r**2) + jnp.sum(lin.up_r**2) + jnp.sum(lin.pr_r**2)
    )


def dense_information(g: PoseGraph):
    """EXACT dense Gauss-Newton information matrix H = J^T J (6K, 6K) over
    ALL factor blocks (prior + between + unary), per-node layout
    [rot(3), trans(3)]. This is the normal-equations matrix whose inverse
    block is the reference's `isam->marginalCovariance(key)`
    (`mapOptimization.cpp:1437-1445`). O(F·(6K)^2) build + O((6K)^3)
    inverse: validation-scale only — the product path gates GPS on the
    O(1) first-order proxy (`mapping._add_keyframe` `pose_cov_xy`), which
    tests/test_gps.py validates against this exact marginal. Returned as
    float64 numpy (the prior's 1e8 free-position variance makes the
    inverse ill-conditioned in float32). Invalid (unused) node slots are
    pinned with a unit prior so H stays invertible."""
    import numpy as _np

    lin = _linearize(g)
    K = g.trans.shape[0]
    D = 6 * K
    H = _np.zeros((D, D))

    bf_J = _np.asarray(lin.bf_J, _np.float64)
    bf_i = _np.asarray(g.bf_i)
    bf_j = _np.asarray(g.bf_j)
    for f in range(bf_J.shape[0]):
        i, j = int(bf_i[f]), int(bf_j[f])
        Jf = _np.zeros((6, D))
        Jf[:, 6 * i:6 * i + 6] += bf_J[f, :, 0:6]
        Jf[:, 6 * j:6 * j + 6] += bf_J[f, :, 6:12]
        H += Jf.T @ Jf
    up_J = _np.asarray(lin.up_J, _np.float64)
    up_k = _np.asarray(g.up_k)
    for u in range(up_J.shape[0]):
        k = int(up_k[u])
        Ju = _np.zeros((3, D))
        Ju[:, 6 * k:6 * k + 6] = up_J[u]
        H += Ju.T @ Ju
    J0 = _np.zeros((6, D))
    J0[:, 0:6] = _np.asarray(lin.pr_J, _np.float64)
    H += J0.T @ J0
    pin = _np.repeat(~_np.asarray(g.node_valid), 6).astype(_np.float64)
    H += _np.diag(pin)
    return H


def dense_marginal_covariance(g: PoseGraph, node: int):
    """Exact (6, 6) marginal covariance of `node` — the dense-inverse
    equivalent of the reference's marginalCovariance gate read
    (`mapOptimization.cpp:1437-1445`: entries (3,3)/(4,4) are the x/y
    position variances, layout [rot(3), trans(3)]). Validation-scale only;
    see `dense_information`."""
    import numpy as _np

    cov = _np.linalg.inv(dense_information(g))
    return cov[6 * node:6 * node + 6, 6 * node:6 * node + 6]
