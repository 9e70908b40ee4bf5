"""Point-to-point ICP — the loop-closure verifier.

TPU re-design of the PCL ICP call in `performLoopClosure`
(`lidar_odometry/src/mapOptimization.cpp:586-628`): max 100 iterations,
max correspondence distance 2x historyKeyframeSearchRadius, convergence
checked via fitness score < historyKeyframeFitnessScore (0.3).

Each iteration: exact 1-NN (streamed MXU distance matmul, `scan2map.knn`),
then the closed-form SVD (Umeyama/Kabsch) alignment of the matched pairs.
Fixed iteration count under `lax.scan`; fitness = mean squared distance of
source points to their nearest target (PCL getFitnessScore semantics).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import lie
from .scan2map import knn


class ICPResult(NamedTuple):
    trans: jax.Array  # (3,) source -> target
    quat: jax.Array  # (4,)
    fitness: jax.Array  # () mean squared correspondence distance
    num_corr: jax.Array  # () int32 correspondences in final iteration


def _kabsch(src, dst, w):
    """Weighted rigid alignment src -> dst (rotation + translation)."""
    wsum = jnp.maximum(jnp.sum(w), 1e-6)
    mu_s = jnp.sum(src * w[:, None], axis=0) / wsum
    mu_d = jnp.sum(dst * w[:, None], axis=0) / wsum
    S = ((src - mu_s) * w[:, None]).T @ (dst - mu_d)  # (3,3)
    U, _, Vt = jnp.linalg.svd(S)
    d = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
    flip = jnp.diag(jnp.array([1.0, 1.0, 1.0])).at[2, 2].set(d)
    R = Vt.T @ flip @ U.T
    t = mu_d - R @ mu_s
    return R, t


@partial(jax.jit, static_argnames=("iters", "chunk"))
def icp_point2point(
    src: jax.Array,  # (N, 3) source cloud
    src_valid: jax.Array,
    dst: jax.Array,  # (M, 3) target cloud
    dst_valid: jax.Array,
    init_trans: jax.Array,  # (3,)
    init_quat: jax.Array,  # (4,)
    max_corr_dist: float = 30.0,
    iters: int = 30,
    chunk: int = 4096,
) -> ICPResult:
    def body(carry, _):
        R, t = carry
        moved = src @ R.T + t
        idx, sqd = knn(moved, src_valid, dst, dst_valid, k=1, chunk=chunk)
        nn = dst[idx[:, 0]]
        w = (src_valid & (sqd[:, 0] < max_corr_dist**2)).astype(src.dtype)
        dR, dt = _kabsch(moved, nn, w)
        R_new = dR @ R
        t_new = dR @ t + dt
        return (R_new, t_new), None

    R0 = lie.quat_to_matrix(init_quat)
    (R, t), _ = jax.lax.scan(body, (R0, init_trans), None, length=iters)

    moved = src @ R.T + t
    idx, sqd = knn(moved, src_valid, dst, dst_valid, k=1, chunk=chunk)
    w = src_valid & (sqd[:, 0] < max_corr_dist**2)
    n = jnp.maximum(jnp.sum(w), 1)
    fitness = jnp.sum(jnp.where(w, sqd[:, 0], 0.0)) / n.astype(src.dtype)
    return ICPResult(
        trans=t, quat=lie.matrix_to_quat(R), fitness=fitness, num_corr=jnp.sum(w)
    )
