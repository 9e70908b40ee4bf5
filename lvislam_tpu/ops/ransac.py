"""Batched-hypothesis RANSAC estimators.

Replaces the reference's OpenCV RANSAC calls with fixed-shape, all-
hypotheses-in-parallel versions (no data-dependent iteration counts):

- `fundamental_ransac` ⇔ cv::findFundamentalMat(FM_RANSAC, F_THRESHOLD)
  used for tracker outlier rejection (`feature_tracker.cpp:209-242`
  rejectWithF, on virtual-pinhole projected points with FOCAL_LENGTH=460).
- `pnp_ransac` ⇔ cv::solvePnPRansac used by loop verification
  (`pose_graph/src/keyframe.cpp:135-176`) — P3P-free formulation: each
  hypothesis solves a 6-point DLT then counts reprojection inliers; the
  best hypothesis is refined by Gauss-Newton on all inliers.

All hypotheses are sampled with a counter-based PRNG (deterministic), their
models solved as one batched linear algebra call, and inlier counting is a
single (hypotheses x points) matmul-shaped reduction — the classic
sequential RANSAC loop becomes two fused device ops.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import lie


def _sample_indices(key, n_hyp: int, k: int, n_pts: int, weights: jax.Array):
    """(n_hyp, k) random indices, weighted by validity."""
    keys = jax.random.split(key, n_hyp)

    def one(kk):
        return jax.random.choice(kk, n_pts, (k,), replace=False, p=weights)

    return jax.vmap(one)(keys)


def _solve_min_eigvec(A: jax.Array, iters: int = 12):
    """Smallest right-singular vector of batched A (..., m, n) via inverse
    power iteration on A^T A (avoids slow batched SVD on TPU)."""
    AtA = jnp.einsum("...mi,...mj->...ij", A, A)
    n = AtA.shape[-1]
    reg = 1e-7 * jnp.eye(n, dtype=A.dtype)
    tr = jnp.trace(AtA, axis1=-2, axis2=-1)[..., None, None] / n
    M = AtA + 1e-6 * tr * jnp.eye(n, dtype=A.dtype) + reg
    lu, piv = jax.scipy.linalg.lu_factor(M)
    v = jnp.ones(AtA.shape[:-1], A.dtype)

    def body(v, _):
        v = jax.scipy.linalg.lu_solve((lu, piv), v[..., None])[..., 0]
        v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
        return v, None

    v, _ = jax.lax.scan(body, v, None, length=iters)
    return v


class FRansacResult(NamedTuple):
    inliers: jax.Array  # (N,) bool
    F: jax.Array  # (3, 3)
    n_inliers: jax.Array  # ()


@partial(jax.jit, static_argnames=("n_hyp",))
def fundamental_ransac(
    pts1: jax.Array,  # (N, 2) pixel coords (virtual pinhole)
    pts2: jax.Array,  # (N, 2)
    valid: jax.Array,  # (N,)
    threshold: float = 1.0,  # pixels (F_THRESHOLD)
    n_hyp: int = 256,
    seed: int = 0,
) -> FRansacResult:
    """Normalized 8-point RANSAC; inlier metric = symmetric epipolar
    distance (OpenCV FM_RANSAC semantics)."""
    N = pts1.shape[0]
    key = jax.random.PRNGKey(seed)
    w = valid.astype(jnp.float32)
    w = w / jnp.maximum(jnp.sum(w), 1.0)
    idx = _sample_indices(key, n_hyp, 8, N, w)  # (H, 8)

    # normalize (Hartley): shift/scale each hypothesis's 8 points
    p1 = pts1[idx]  # (H, 8, 2)
    p2 = pts2[idx]

    def normalize(p):
        mu = jnp.mean(p, axis=1, keepdims=True)
        d = jnp.mean(jnp.linalg.norm(p - mu, axis=-1), axis=1)
        s = jnp.sqrt(2.0) / jnp.maximum(d, 1e-6)
        T = jnp.zeros(p.shape[:1] + (3, 3), p.dtype)
        T = T.at[:, 0, 0].set(s).at[:, 1, 1].set(s).at[:, 2, 2].set(1.0)
        T = T.at[:, 0, 2].set(-s * mu[:, 0, 0]).at[:, 1, 2].set(-s * mu[:, 0, 1])
        return (p - mu) * s[:, None, None], T

    p1n, T1 = normalize(p1)
    p2n, T2 = normalize(p2)

    # 8-point: rows [x2x1, x2y1, x2, y2x1, y2y1, y2, x1, y1, 1]
    x1, y1 = p1n[..., 0], p1n[..., 1]
    x2, y2 = p2n[..., 0], p2n[..., 1]
    A = jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, jnp.ones_like(x1)],
        axis=-1,
    )  # (H, 8, 9)
    f = _solve_min_eigvec(A)  # (H, 9)
    F = f.reshape(-1, 3, 3)
    # enforce rank 2 via closed-form: subtract smallest singular component —
    # approximate by symmetric projection (adequate for inlier counting)
    F = T2.transpose(0, 2, 1) @ F @ T1
    F = F / jnp.maximum(jnp.abs(F[:, 2:3, 2:3]), 1e-9)

    ones = jnp.ones((N, 1), pts1.dtype)
    h1 = jnp.concatenate([pts1, ones], axis=-1)  # (N, 3)
    h2 = jnp.concatenate([pts2, ones], axis=-1)
    Fx1 = jnp.einsum("hij,nj->hni", F, h1)  # (H, N, 3)
    Ftx2 = jnp.einsum("hji,nj->hni", F, h2)
    x2Fx1 = jnp.einsum("ni,hni->hn", h2, Fx1)
    d2 = x2Fx1**2 * (
        1.0 / jnp.maximum(Fx1[..., 0] ** 2 + Fx1[..., 1] ** 2, 1e-12)
        + 1.0 / jnp.maximum(Ftx2[..., 0] ** 2 + Ftx2[..., 1] ** 2, 1e-12)
    )
    inl = (d2 < threshold**2) & valid[None, :]
    counts = jnp.sum(inl, axis=1)
    best = jnp.argmax(counts)
    return FRansacResult(inliers=inl[best], F=F[best], n_inliers=counts[best])


class PnPResult(NamedTuple):
    trans: jax.Array  # (3,) world -> camera
    quat: jax.Array  # (4,)
    inliers: jax.Array  # (N,)
    n_inliers: jax.Array  # ()


def _dlt_pose(X: jax.Array, uv: jax.Array):
    """Batched 6+ point DLT for P = [R|t] from world points X (H, K, 3) and
    normalized image points uv (H, K, 2). Returns (R (H,3,3), t (H,3)).

    Object points are Hartley-normalized (centroid + isotropic scale) before
    the homogeneous solve — without it the 12-dim system is too
    ill-conditioned in f32 for scenes far from the origin."""
    H, K, _ = X.shape
    c = jnp.mean(X, axis=1, keepdims=True)
    spread = jnp.mean(jnp.linalg.norm(X - c, axis=-1), axis=1)
    s = jnp.sqrt(3.0) / jnp.maximum(spread, 1e-6)
    X = (X - c) * s[:, None, None]
    zeros = jnp.zeros((H, K, 4), X.dtype)
    Xh = jnp.concatenate([X, jnp.ones((H, K, 1), X.dtype)], axis=-1)
    r1 = jnp.concatenate([Xh, zeros, -uv[..., 0:1] * Xh], axis=-1)
    r2 = jnp.concatenate([zeros, Xh, -uv[..., 1:2] * Xh], axis=-1)
    A = jnp.concatenate([r1, r2], axis=1)  # (H, 2K, 12)
    p = _solve_min_eigvec(A)  # (H, 12)
    P = p.reshape(-1, 3, 4)
    # sign fix: a proper rotation needs det(M) > 0 (cheirality is enforced
    # later by the positive-depth inlier gate)
    M = P[:, :, :3]
    det = jnp.linalg.det(M)
    sign = jnp.sign(det)
    P = P * sign[:, None, None]
    M = P[:, :, :3]
    scale = jnp.cbrt(jnp.maximum(jnp.linalg.det(M), 1e-12))
    M = M / scale[:, None, None]
    t = P[:, :, 3] / scale[:, None]

    # polar decomposition: R = M (M^T M)^(-1/2) via Newton iteration
    def body(R, _):
        return 0.5 * (R + jnp.linalg.inv(jnp.swapaxes(R, 1, 2))), None

    R, _ = jax.lax.scan(body, M, None, length=6)
    # undo the normalization: x ∝ R(s(X - c)) + t_n = s[R X + (t_n/s - R c)]
    t = t / s[:, None] - jnp.einsum("hij,hj->hi", R, c[:, 0, :])
    return R, t


@partial(jax.jit, static_argnames=("n_hyp", "refine_iters"))
def pnp_ransac(
    obj_pts: jax.Array,  # (N, 3) world points
    img_pts: jax.Array,  # (N, 2) normalized-plane observations
    valid: jax.Array,  # (N,)
    threshold: float = 10.0 / 460.0,  # reprojection gate (normalized units)
    n_hyp: int = 128,
    refine_iters: int = 5,
    seed: int = 0,
) -> PnPResult:
    """Parallel-hypothesis PnP: 6-point DLT per hypothesis + best-model GN
    refinement on inliers (cv::solvePnPRansac + iterative refine)."""
    N = obj_pts.shape[0]
    key = jax.random.PRNGKey(seed + 1)
    w = valid.astype(jnp.float32)
    w = w / jnp.maximum(jnp.sum(w), 1.0)
    idx = _sample_indices(key, n_hyp, 6, N, w)
    R, t = _dlt_pose(obj_pts[idx], img_pts[idx])

    Pc = jnp.einsum("hij,nj->hni", R, obj_pts) + t[:, None, :]  # (H, N, 3)
    proj = Pc[..., :2] / jnp.maximum(Pc[..., 2:3], 1e-6)
    err = jnp.linalg.norm(proj - img_pts[None], axis=-1)
    inl = (err < threshold) & valid[None, :] & (Pc[..., 2] > 0.05)
    counts = jnp.sum(inl, axis=1)
    best = jnp.argmax(counts)
    Rb, tb = R[best], t[best]
    inliers = inl[best]

    # GN refinement over all inliers
    q0 = lie.matrix_to_quat(Rb)
    x = jnp.concatenate([jnp.zeros(3, obj_pts.dtype), tb])

    def residual(x, q_base):
        q = lie.quat_multiply(q_base, lie.so3_exp_quat(x[:3]))
        Pc = lie.quat_rotate(q[None], obj_pts) + x[3:6][None]
        proj = Pc[..., :2] / jnp.maximum(Pc[..., 2:3], 1e-6)
        r = (proj - img_pts) * inliers[:, None]
        return r.reshape(-1)

    def gn(carry, _):
        x, q_base = carry
        J = jax.jacfwd(residual)(x, q_base)
        r = residual(x, q_base)
        H = J.T @ J + 1e-8 * jnp.eye(6)
        x = x - jnp.linalg.solve(H, J.T @ r)
        return (x, q_base), None

    (x, _), _ = jax.lax.scan(gn, (x, q0), None, length=refine_iters)
    q = lie.quat_normalize(lie.quat_multiply(q0, lie.so3_exp_quat(x[:3])))
    return PnPResult(trans=x[3:6], quat=q, inliers=inliers, n_inliers=counts[best])
