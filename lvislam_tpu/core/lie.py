"""SO(3) / SE(3) / quaternion math substrate.

TPU-native re-design of the reference's Eigen-based rotation utilities
(`vins_estimator/src/utility/utility.h:15-117`: deltaQ, skewSymmetric,
Qleft/Qright, R2ypr/ypr2R, g2R) plus the exp/log maps the solvers need.

Conventions (match Eigen / the reference):
- Quaternions are Hamilton, stored as ``[w, x, y, z]`` arrays of shape (..., 4).
- Rotation matrices act on column vectors: ``x_world = R @ x_body``.
- All functions are shape-polymorphic over leading batch dimensions and safe
  under ``jit`` / ``vmap`` / ``grad`` (no data-dependent Python control flow;
  Taylor fallbacks near singular angles are branch-free ``where`` selects).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


# ---------------------------------------------------------------------------
# Quaternion algebra (Hamilton, wxyz)
# ---------------------------------------------------------------------------

def quat_identity(dtype=jnp.float32) -> jax.Array:
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def quat_multiply(q: jax.Array, p: jax.Array) -> jax.Array:
    """Hamilton product q ⊗ p (rotation composition: first p, then q)."""
    qw, qx, qy, qz = jnp.moveaxis(q, -1, 0)
    pw, px, py, pz = jnp.moveaxis(p, -1, 0)
    return jnp.stack(
        [
            qw * pw - qx * px - qy * py - qz * pz,
            qw * px + qx * pw + qy * pz - qz * py,
            qw * py - qx * pz + qy * pw + qz * px,
            qw * pz + qx * py - qy * px + qz * pw,
        ],
        axis=-1,
    )


def quat_conjugate(q: jax.Array) -> jax.Array:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_inverse(q: jax.Array) -> jax.Array:
    return quat_conjugate(q) / jnp.sum(q * q, axis=-1, keepdims=True)


def quat_normalize(q: jax.Array) -> jax.Array:
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector(s) v by unit quaternion(s) q; equals R(q) @ v."""
    w = q[..., 0:1]
    u = q[..., 1:4]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def delta_q(theta: jax.Array) -> jax.Array:
    """Small-angle quaternion [1, θ/2] (reference `utility.h:16-28` deltaQ).

    Note: deliberately *unnormalized*, exactly as the reference uses it inside
    preintegration midpoint updates.
    """
    half = 0.5 * theta
    one = jnp.ones_like(half[..., :1])
    return jnp.concatenate([one, half], axis=-1)


def quat_to_matrix(q: jax.Array) -> jax.Array:
    """Unit quaternion → rotation matrix (Eigen `toRotationMatrix` layout)."""
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    tx, ty, tz = 2.0 * x, 2.0 * y, 2.0 * z
    twx, twy, twz = tx * w, ty * w, tz * w
    txx, txy, txz = tx * x, ty * x, tz * x
    tyy, tyz, tzz = ty * y, tz * y, tz * z
    r = jnp.stack(
        [
            1.0 - (tyy + tzz), txy - twz, txz + twy,
            txy + twz, 1.0 - (txx + tzz), tyz - twx,
            txz - twy, tyz + twx, 1.0 - (txx + tyy),
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quat(R: jax.Array) -> jax.Array:
    """Rotation matrix → unit quaternion (wxyz), branch-free Shepperd method."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate constructions; pick the numerically best by largest pivot.
    qw0 = jnp.sqrt(jnp.maximum(1.0 + tr, _EPS)) / 2.0
    q0 = jnp.stack([qw0, (m21 - m12) / (4.0 * qw0), (m02 - m20) / (4.0 * qw0),
                    (m10 - m01) / (4.0 * qw0)], axis=-1)
    qx1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, _EPS)) / 2.0
    q1 = jnp.stack([(m21 - m12) / (4.0 * qx1), qx1, (m01 + m10) / (4.0 * qx1),
                    (m02 + m20) / (4.0 * qx1)], axis=-1)
    qy2 = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, _EPS)) / 2.0
    q2 = jnp.stack([(m02 - m20) / (4.0 * qy2), (m01 + m10) / (4.0 * qy2), qy2,
                    (m12 + m21) / (4.0 * qy2)], axis=-1)
    qz3 = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, _EPS)) / 2.0
    q3 = jnp.stack([(m10 - m01) / (4.0 * qz3), (m02 + m20) / (4.0 * qz3),
                    (m12 + m21) / (4.0 * qz3), qz3], axis=-1)

    cand = jnp.stack([tr, m00, m11, m22], axis=-1)
    idx = jnp.argmax(cand, axis=-1)
    qs = jnp.stack([q0, q1, q2, q3], axis=-2)
    q = jnp.take_along_axis(qs, idx[..., None, None].astype(jnp.int32), axis=-2)
    return quat_normalize(q[..., 0, :])


def quat_left(q: jax.Array) -> jax.Array:
    """4×4 left-multiplication matrix: Qleft(q) @ p == q ⊗ p
    (reference `utility.h:51-60`)."""
    w = q[..., 0]
    v = q[..., 1:4]
    eye = jnp.eye(3, dtype=q.dtype)
    top = jnp.concatenate([w[..., None, None], -v[..., None, :]], axis=-1)
    bottom = jnp.concatenate(
        [v[..., :, None], w[..., None, None] * eye + skew(v)], axis=-1
    )
    return jnp.concatenate([top, bottom], axis=-2)


def quat_right(p: jax.Array) -> jax.Array:
    """4×4 right-multiplication matrix: Qright(p) @ q == q ⊗ p
    (reference `utility.h:62-71`)."""
    w = p[..., 0]
    v = p[..., 1:4]
    eye = jnp.eye(3, dtype=p.dtype)
    top = jnp.concatenate([w[..., None, None], -v[..., None, :]], axis=-1)
    bottom = jnp.concatenate(
        [v[..., :, None], w[..., None, None] * eye - skew(v)], axis=-1
    )
    return jnp.concatenate([top, bottom], axis=-2)


def quat_slerp(q0: jax.Array, q1: jax.Array, t) -> jax.Array:
    """Spherical linear interpolation (shortest arc), branch-free."""
    q0 = quat_normalize(q0)
    q1 = quat_normalize(q1)
    d = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(d < 0.0, -q1, q1)
    d = jnp.abs(d)
    d = jnp.clip(d, -1.0, 1.0)
    theta = jnp.arccos(d)
    sin_theta = jnp.sin(theta)
    small = sin_theta < 1e-5
    w0 = jnp.where(small, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.where(small, 1.0, sin_theta))
    w1 = jnp.where(small, t, jnp.sin(t * theta) / jnp.where(small, 1.0, sin_theta))
    return quat_normalize(w0 * q0 + w1 * q1)


# ---------------------------------------------------------------------------
# so(3) maps
# ---------------------------------------------------------------------------

def skew(v: jax.Array) -> jax.Array:
    """Skew-symmetric matrix [v]× (reference `utility.h:30-38`)."""
    zero = jnp.zeros_like(v[..., 0])
    r = jnp.stack(
        [zero, -v[..., 2], v[..., 1],
         v[..., 2], zero, -v[..., 0],
         -v[..., 1], v[..., 0], zero],
        axis=-1,
    )
    return r.reshape(v.shape[:-1] + (3, 3))


def so3_exp_quat(phi: jax.Array) -> jax.Array:
    """Exact exponential map axis-angle → unit quaternion, Taylor-safe."""
    angle_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    angle = jnp.sqrt(jnp.maximum(angle_sq, _EPS * _EPS))
    small = angle_sq < 1e-12
    half = 0.5 * angle
    # sin(θ/2)/θ with Taylor fallback 1/2 − θ²/48
    k = jnp.where(small, 0.5 - angle_sq / 48.0, jnp.sin(half) / angle)
    w = jnp.where(small, 1.0 - angle_sq / 8.0, jnp.cos(half))
    return jnp.concatenate([w, k * phi], axis=-1)


def so3_exp(phi: jax.Array) -> jax.Array:
    """Exponential map axis-angle → rotation matrix (Rodrigues)."""
    return quat_to_matrix(so3_exp_quat(phi))


def so3_log(R: jax.Array) -> jax.Array:
    """Logarithm map rotation matrix → axis-angle, Taylor-safe."""
    return quat_log(matrix_to_quat(R))


def quat_log(q: jax.Array) -> jax.Array:
    """Unit quaternion → axis-angle (rotation vector)."""
    q = jnp.where(q[..., 0:1] < 0.0, -q, q)  # shortest arc
    w = jnp.clip(q[..., 0:1], -1.0, 1.0)
    vn = jnp.linalg.norm(q[..., 1:4], axis=-1, keepdims=True)
    angle = 2.0 * jnp.arctan2(vn, w)
    small = vn < 1e-8
    scale = jnp.where(small, 2.0 / jnp.maximum(w, _EPS), angle / jnp.maximum(vn, _EPS))
    return scale * q[..., 1:4]


def so3_right_jacobian(phi: jax.Array) -> jax.Array:
    """Right Jacobian of SO(3): Jr(φ) = I − (1−cosθ)/θ² [φ]× + (θ−sinθ)/θ³ [φ]×²."""
    theta_sq = jnp.sum(phi * phi, axis=-1)[..., None, None]
    theta = jnp.sqrt(jnp.maximum(theta_sq, _EPS * _EPS))
    P = skew(phi)
    PP = P @ P
    small = theta_sq < 1e-10
    a = jnp.where(small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(theta)) / jnp.maximum(theta_sq, _EPS))
    b = jnp.where(small, 1.0 / 6.0 - theta_sq / 120.0,
                  (theta - jnp.sin(theta)) / jnp.maximum(theta_sq * theta, _EPS))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), P.shape)
    return eye - a * P + b * PP


def so3_right_jacobian_inv(phi: jax.Array) -> jax.Array:
    """Inverse right Jacobian of SO(3)."""
    theta_sq = jnp.sum(phi * phi, axis=-1)[..., None, None]
    theta = jnp.sqrt(jnp.maximum(theta_sq, _EPS * _EPS))
    P = skew(phi)
    PP = P @ P
    small = theta_sq < 1e-10
    half_theta = 0.5 * theta
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + theta_sq / 720.0,
        (1.0 / jnp.maximum(theta_sq, _EPS))
        - (1.0 + jnp.cos(theta)) / jnp.maximum(2.0 * theta * jnp.sin(theta), _EPS),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), P.shape)
    return eye + 0.5 * P + cot_term * PP


# ---------------------------------------------------------------------------
# Euler (yaw-pitch-roll, degrees — reference convention) and gravity alignment
# ---------------------------------------------------------------------------

def matrix_to_ypr(R: jax.Array) -> jax.Array:
    """R → [yaw, pitch, roll] in DEGREES (reference `utility.h:73-89` R2ypr)."""
    n = R[..., :, 0]
    o = R[..., :, 1]
    a = R[..., :, 2]
    y = jnp.arctan2(n[..., 1], n[..., 0])
    p = jnp.arctan2(-n[..., 2], n[..., 0] * jnp.cos(y) + n[..., 1] * jnp.sin(y))
    r = jnp.arctan2(
        a[..., 0] * jnp.sin(y) - a[..., 1] * jnp.cos(y),
        -o[..., 0] * jnp.sin(y) + o[..., 1] * jnp.cos(y),
    )
    return jnp.stack([y, p, r], axis=-1) * (180.0 / jnp.pi)


def ypr_to_matrix(ypr: jax.Array) -> jax.Array:
    """[yaw, pitch, roll] DEGREES → R = Rz(y)Ry(p)Rx(r)
    (reference `utility.h:91-117` ypr2R)."""
    rad = ypr * (jnp.pi / 180.0)
    y, p, r = rad[..., 0], rad[..., 1], rad[..., 2]
    cy, sy = jnp.cos(y), jnp.sin(y)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cr, sr = jnp.cos(r), jnp.sin(r)
    R = jnp.stack(
        [
            cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr,
            sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr,
            -sp, cp * sr, cp * cr,
        ],
        axis=-1,
    )
    return R.reshape(ypr.shape[:-1] + (3, 3))


def rpy_to_quat(roll: jax.Array, pitch: jax.Array, yaw: jax.Array) -> jax.Array:
    """Roll/pitch/yaw (RADIANS) → quaternion, ZYX convention (tf2 setRPY)."""
    ypr_deg = jnp.stack([yaw, pitch, roll], axis=-1) * (180.0 / jnp.pi)
    return matrix_to_quat(ypr_to_matrix(ypr_deg))


def quat_to_rpy(q: jax.Array):
    """Quaternion → (roll, pitch, yaw) RADIANS (tf2 getRPY equivalent)."""
    ypr = matrix_to_ypr(quat_to_matrix(q)) * (jnp.pi / 180.0)
    return ypr[..., 2], ypr[..., 1], ypr[..., 0]


def g2R(g: jax.Array) -> jax.Array:
    """World-from-body rotation aligning measured gravity direction `g` with
    +z and zeroing yaw (reference `utility.cpp` Utility::g2R semantics)."""
    ng1 = g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True), _EPS)
    ng2 = jnp.array([0.0, 0.0, 1.0], dtype=g.dtype)
    # FromTwoVectors(ng1, ng2)
    v = jnp.cross(ng1, jnp.broadcast_to(ng2, ng1.shape))
    c = jnp.sum(ng1 * ng2, axis=-1, keepdims=True)
    axis_norm = jnp.linalg.norm(v, axis=-1, keepdims=True)
    angle = jnp.arctan2(axis_norm, c)
    axis = v / jnp.maximum(axis_norm, _EPS)
    R0 = so3_exp(axis * angle)
    yaw = matrix_to_ypr(R0)[..., 0:1]
    yaw_fix = jnp.concatenate([-yaw, jnp.zeros_like(yaw), jnp.zeros_like(yaw)], axis=-1)
    return ypr_to_matrix(yaw_fix) @ R0


# ---------------------------------------------------------------------------
# SE(3) — poses as (t: (...,3), q: (...,4)) pairs
# ---------------------------------------------------------------------------

def se3_compose(t1, q1, t2, q2):
    """T1 ∘ T2: first apply T2, then T1."""
    return t1 + quat_rotate(q1, t2), quat_normalize(quat_multiply(q1, q2))


def se3_inverse(t, q):
    qi = quat_conjugate(q)
    return -quat_rotate(qi, t), qi


def se3_apply(t, q, pts):
    """Transform points (..., N, 3) by pose (t, q)."""
    return quat_rotate(q[..., None, :], pts) + t[..., None, :]


def se3_relative(t1, q1, t2, q2):
    """T1⁻¹ ∘ T2 — the pose of frame 2 expressed in frame 1."""
    ti, qi = se3_inverse(t1, q1)
    return se3_compose(ti, qi, t2, q2)


def pose6_to_matrix(x6: jax.Array) -> jax.Array:
    """6-vector [roll, pitch, yaw, tx, ty, tz] (radians, the LIS
    `transformTobeMapped` layout, `mapOptimization.cpp:80`) → 4×4 affine."""
    R = ypr_to_matrix(
        jnp.stack([x6[..., 2], x6[..., 1], x6[..., 0]], axis=-1) * (180.0 / jnp.pi)
    )
    top = jnp.concatenate([R, x6[..., 3:6, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=x6.dtype), x6.shape[:-1] + (4,)
    )[..., None, :]
    return jnp.concatenate([top, bottom], axis=-2)


def matrix_to_pose6(T: jax.Array) -> jax.Array:
    """4×4 affine → [roll, pitch, yaw, tx, ty, tz] radians."""
    ypr = matrix_to_ypr(T[..., :3, :3]) * (jnp.pi / 180.0)
    return jnp.concatenate(
        [jnp.stack([ypr[..., 2], ypr[..., 1], ypr[..., 0]], axis=-1), T[..., :3, 3]],
        axis=-1,
    )
