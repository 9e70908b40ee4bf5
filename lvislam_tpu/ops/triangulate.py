"""Triangulation and two-view relative pose.

Covers the reference's:
- `GlobalSFM::triangulatePoint` DLT (`vins_estimator/src/initial/
  initial_sfm.cpp:100-115`) — here batched over points/views;
- `FeatureManager::triangulate` multi-view SVD (`feature_manager.cpp:
  213-268`) — batched least squares over the whole feature table;
- `MotionEstimator::solveRelativeRT` (`initial/solve_5pts.cpp:193-210`):
  the reference runs OpenCV's 5-point essential RANSAC; here the essential
  matrix comes from normalized-coordinate 8-point RANSAC (same estimator
  family, fixed-shape) followed by the standard 4-way decomposition with
  cheirality voting (`recoverPose` equivalent).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import lie
from .ransac import fundamental_ransac, _solve_min_eigvec


def triangulate_two_view(
    P0: jax.Array,  # (3, 4) projection matrix of view 0 ([R|t] world->cam)
    P1: jax.Array,  # (3, 4)
    x0: jax.Array,  # (..., 2) normalized image coords in view 0
    x1: jax.Array,  # (..., 2)
) -> jax.Array:
    """Batched DLT triangulation -> world points (..., 3)."""
    rows = jnp.stack(
        [
            x0[..., 0, None] * P0[2] - P0[0],
            x0[..., 1, None] * P0[2] - P0[1],
            x1[..., 0, None] * P1[2] - P1[0],
            x1[..., 1, None] * P1[2] - P1[1],
        ],
        axis=-2,
    )  # (..., 4, 4)
    v = _solve_min_eigvec(rows)
    return v[..., :3] / jnp.where(jnp.abs(v[..., 3:]) > 1e-12, v[..., 3:], jnp.inf)


def triangulate_multiview(
    Rs: jax.Array,  # (K, 3, 3) world->cam rotations per view
    ts: jax.Array,  # (K, 3)
    obs: jax.Array,  # (K, 2) normalized observations
    valid: jax.Array,  # (K,) which views observe the point
):
    """Multi-view DLT with masked rows (`feature_manager.cpp:213-268`
    builds the same stacked system). Returns (point (3,), depth-in-view0)."""
    P = jnp.concatenate([Rs, ts[..., None]], axis=-1)  # (K, 3, 4)
    r1 = obs[..., 0, None] * P[:, 2] - P[:, 0]
    r2 = obs[..., 1, None] * P[:, 2] - P[:, 1]
    rows = jnp.concatenate([r1, r2], axis=0)  # (2K, 4)
    w = jnp.concatenate([valid, valid]).astype(rows.dtype)
    v = _solve_min_eigvec(rows * w[:, None])
    pt = v[:3] / jnp.where(jnp.abs(v[3]) > 1e-12, v[3], jnp.inf)
    depth0 = (Rs[0] @ pt + ts[0])[2]
    return pt, depth0


class RelPose(NamedTuple):
    R: jax.Array  # (3, 3) rotation l->cur:  x_cur = R x_l + t
    t: jax.Array  # (3,) unit-norm translation
    inliers: jax.Array  # (N,)
    ok: jax.Array  # ()


@partial(jax.jit, static_argnames=("n_hyp",))
def relative_pose(
    x0: jax.Array,  # (N, 2) normalized coords, frame l
    x1: jax.Array,  # (N, 2) normalized coords, current frame
    valid: jax.Array,
    threshold: float = 0.3 / 460.0,
    n_hyp: int = 256,
) -> RelPose:
    """Essential-matrix relative pose with cheirality voting
    (`solve_5pts.cpp:193-210` semantics)."""
    fr = fundamental_ransac(x0, x1, valid, threshold=threshold, n_hyp=n_hyp)
    E = fr.F  # normalized coords => F == E (up to scale)
    # project E to the essential manifold: equal singular values. Use
    # E ~ U diag(1,1,0) V^T via two-sided polar-style correction with the
    # closed-form 3x3 SVD substitute: EE^T eigen-decomposition.
    U, S, Vt = jnp.linalg.svd(E)  # single 3x3 — cheap even on TPU
    D = jnp.diag(jnp.array([1.0, 1.0, 0.0], E.dtype))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)

    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    R1 = R1 * jnp.sign(jnp.linalg.det(R1))
    R2 = R2 * jnp.sign(jnp.linalg.det(R2))
    tu = U[:, 2]

    def count_cheirality(R, t):
        # triangulate with P0=[I|0], P1=[R|t]; count points in front of both
        P0 = jnp.concatenate([jnp.eye(3, dtype=E.dtype), jnp.zeros((3, 1), E.dtype)], axis=1)
        P1 = jnp.concatenate([R, t[:, None]], axis=1)
        X = triangulate_two_view(P0, P1, x0, x1)
        z0 = X[..., 2]
        z1 = (X @ R.T + t)[..., 2]
        good = (z0 > 0) & (z1 > 0) & fr.inliers
        return jnp.sum(good), X

    cands = [(R1, tu), (R1, -tu), (R2, tu), (R2, -tu)]
    counts = jnp.stack([count_cheirality(R, t)[0] for R, t in cands])
    best = jnp.argmax(counts)
    Rb = jnp.stack([c[0] for c in cands])[best]
    tb = jnp.stack([c[1] for c in cands])[best]
    # reference requires > 12 inliers for validity (`solve_5pts.cpp:205`)
    ok = (fr.n_inliers > 12) & (counts[best] > 0.7 * jnp.maximum(fr.n_inliers, 1))
    return RelPose(R=Rb, t=tb, inliers=fr.inliers, ok=ok)
