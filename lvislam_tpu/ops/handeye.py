"""Hand-eye extrinsic rotation self-calibration.

TPU re-design of `vins_estimator/src/initial/initial_ex_rotation.cpp:11-67`
(`CalibrationExRotation`): solve the camera-IMU rotation q_ic from pairs of
per-frame camera relative rotations (epipolar) and IMU preintegration
rotations, via the quaternion hand-eye equation

    q_cam_k ⊗ q_ic = q_ic ⊗ q_imu_k          (for every frame pair k)

Each pair contributes 4 rows  huber_k · (L(q_cam_k) − R(q_imu_k))  to a
(4N, 4) system whose least-squares null vector is q_ic; the Huber weight
down-weights pairs whose rotations disagree with the current estimate
(`initial_ex_rotation.cpp:26-31`). Success requires ≥ `min_pairs` pairs and
the second-smallest singular value > 0.25 (`:56-63`) — i.e., enough rotation
excitation to make the solution unique.

Differences from the reference (TPU-shape): the reference grows vectors and
re-solves sequentially per frame; here the pairs live in a fixed-capacity
ring and the whole weighted SVD re-solves in one fused batch, iterated
twice so the Huber weights see the fresh estimate."""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import lie


def _quat_L(q):
    """Left-multiplication matrix in the reference's [vec, w] layout:
    L(a) [vec(b); w(b)] = [vec(a⊗b); w(a⊗b)] (`initial_ex_rotation.cpp:34-39`).
    q is wxyz; rows/cols ordered (x, y, z, w)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    o = jnp.zeros_like(w)
    sk = jnp.stack([
        jnp.stack([o, -z, y], -1),
        jnp.stack([z, o, -x], -1),
        jnp.stack([-y, x, o], -1),
    ], -2)
    eye = jnp.eye(3, dtype=q.dtype)
    top = jnp.concatenate(
        [w[..., None, None] * eye + sk, q[..., 1:4, None]], axis=-1
    )
    bot = jnp.concatenate(
        [-q[..., None, 1:4], w[..., None, None]], axis=-1
    )
    return jnp.concatenate([top, bot], axis=-2)


def _quat_R(q):
    """Right-multiplication matrix, same layout (`:41-46`)."""
    w = q[..., 0]
    sk_neg = -(_quat_L(q)[..., :3, :3] - w[..., None, None] * jnp.eye(3, dtype=q.dtype))
    top = jnp.concatenate(
        [w[..., None, None] * jnp.eye(3, dtype=q.dtype) + sk_neg, q[..., 1:4, None]],
        axis=-1,
    )
    bot = jnp.concatenate([-q[..., None, 1:4], w[..., None, None]], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


class HandEyeResult(NamedTuple):
    q_ic: jax.Array  # (4,) wxyz camera->IMU rotation estimate
    ok: jax.Array  # () bool: enough pairs + excitation
    sv2: jax.Array  # () second-smallest singular value (excitation measure)


@partial(jax.jit, static_argnames=("iters",))
def calibrate_rotation(
    q_cam: jax.Array,  # (N, 4) wxyz camera delta rotations q_c(k)<-c(k+1)... see note
    q_imu: jax.Array,  # (N, 4) wxyz IMU preintegration delta_q (q_b(k) of b(k+1))
    valid: jax.Array,  # (N,)
    q_init: jax.Array,  # (4,) current q_ic estimate (identity to bootstrap)
    min_pairs: int | jax.Array = 10,
    sv_thresh: float = 0.25,
    iters: int = 2,
) -> HandEyeResult:
    """Batched `CalibrationExRotation`. Conventions: `q_cam[k]` is the
    camera-frame rotation over the same interval and the same sense as the
    IMU preintegration `delta_q` (orientation of frame k+1 expressed in
    frame k) — i.e. the transpose of `triangulate.RelPose.R`."""
    n = jnp.sum(valid)

    def one_iter(q_ic, _):
        # Rc_g = q_ic^-1 ⊗ q_imu ⊗ q_ic (`:16`), angular distance to q_cam
        q_g = lie.quat_multiply(
            lie.quat_multiply(lie.quat_conjugate(q_ic)[None], q_imu),
            jnp.broadcast_to(q_ic[None], q_imu.shape),
        )
        dot = jnp.abs(jnp.sum(lie.quat_normalize(q_cam) * lie.quat_normalize(q_g), -1))
        ang = 2.0 * jnp.arccos(jnp.clip(dot, 0.0, 1.0)) * (180.0 / jnp.pi)
        huber = jnp.where(ang > 5.0, 5.0 / jnp.maximum(ang, 1e-9), 1.0)
        w = jnp.where(valid, huber, 0.0)
        A = w[:, None, None] * (_quat_L(q_cam) - _quat_R(q_imu))  # (N,4,4)
        A = A.reshape(-1, 4)
        # null vector via eigh of AᵀA (4x4 — cheap, avoids tall SVD)
        AtA = A.T @ A
        ew, ev = jnp.linalg.eigh(AtA)  # ascending
        x = ev[:, 0]  # [vec, w] layout
        q_est = lie.quat_normalize(jnp.stack([x[3], x[0], x[1], x[2]]))
        # ric = estimated.inverse() (`:54`)
        q_new = lie.quat_conjugate(q_est)
        sv2 = jnp.sqrt(jnp.maximum(ew[1], 0.0))  # second-smallest singular value
        return q_new, sv2

    q_ic, sv2s = jax.lax.scan(one_iter, q_init, None, length=iters)
    sv2 = sv2s[-1]
    ok = (n >= min_pairs) & (sv2 > sv_thresh)
    return HandEyeResult(q_ic=q_ic, ok=ok, sv2=sv2)
