"""Camera projection models (camodocal equivalents, SURVEY.md §2.5).

Re-implements, as batched branch-free JAX functions, the four camodocal
models behind the `Camera` interface
(`camera_model/include/camodocal/camera_models/Camera.h:76,80`):

- ``lift_projective``: pixel -> unit ray (2D -> 3D), inverting distortion by
  the same 8-step fixed-point recursion the reference uses
  (`CataCamera.cc:597-611` "Recursive distortion model");
- ``space_to_plane``: 3D point -> pixel.

Models: PINHOLE (radtan, `PinholeCamera.cc`), MEI / CataCamera (omni mirror
xi + radtan, `CataCamera.cc` — the shipped config's model,
`params_camera.yaml` model_type: MEI), KANNALA_BRANDT equidistant fisheye
(`EquidistantCamera.cc`), and SCARAMUZZA polynomial omni
(`ScaramuzzaCamera.cc`).

All functions vmap over trailing point batches: inputs (..., 2) / (..., 3).
Parameters live in a small frozen dataclass usable as a jit static or as
dynamic operands.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.config import CameraIntrinsics

PINHOLE = "PINHOLE"
MEI = "MEI"
KANNALA_BRANDT = "KANNALA_BRANDT"
SCARAMUZZA = "SCARAMUZZA"


# ---------------------------------------------------------------------------
# radtan distortion (shared by pinhole + MEI)
# ---------------------------------------------------------------------------

def _radtan(p_u: jax.Array, k1, k2, p1, p2) -> jax.Array:
    """Distortion offset d_u such that p_d = p_u + d_u
    (`CataCamera.cc` distortion / `PinholeCamera.cc` distortion)."""
    mx2 = p_u[..., 0] * p_u[..., 0]
    my2 = p_u[..., 1] * p_u[..., 1]
    mxy = p_u[..., 0] * p_u[..., 1]
    rho2 = mx2 + my2
    rad = k1 * rho2 + k2 * rho2 * rho2
    dx = p_u[..., 0] * rad + 2.0 * p1 * mxy + p2 * (rho2 + 2.0 * mx2)
    dy = p_u[..., 1] * rad + 2.0 * p2 * mxy + p1 * (rho2 + 2.0 * my2)
    return jnp.stack([dx, dy], axis=-1)


def _undistort_recursive(p_d: jax.Array, k1, k2, p1, p2, n: int = 8) -> jax.Array:
    """Fixed-point inverse of radtan (`CataCamera.cc:597-611`)."""
    p_u = p_d - _radtan(p_d, k1, k2, p1, p2)
    for _ in range(n - 1):
        p_u = p_d - _radtan(p_u, k1, k2, p1, p2)
    return p_u


# ---------------------------------------------------------------------------
# model-specific lift / project
# ---------------------------------------------------------------------------

def _pinhole_lift(uv, c: CameraIntrinsics):
    mx_d = (uv[..., 0] - c.u0) / c.gamma1
    my_d = (uv[..., 1] - c.v0) / c.gamma2
    p_d = jnp.stack([mx_d, my_d], axis=-1)
    p_u = _undistort_recursive(p_d, c.k1, c.k2, c.p1, c.p2)
    ones = jnp.ones_like(p_u[..., :1])
    ray = jnp.concatenate([p_u, ones], axis=-1)
    return ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)


def _pinhole_project(P, c: CameraIntrinsics):
    p_u = P[..., :2] / P[..., 2:3]
    p_d = p_u + _radtan(p_u, c.k1, c.k2, c.p1, c.p2)
    return jnp.stack(
        [c.gamma1 * p_d[..., 0] + c.u0, c.gamma2 * p_d[..., 1] + c.v0], axis=-1
    )


def _mei_lift(uv, c: CameraIntrinsics):
    """`CataCamera::liftProjective` (`CataCamera.cc:556-638`)."""
    mx_d = (uv[..., 0] - c.u0) / c.gamma1
    my_d = (uv[..., 1] - c.v0) / c.gamma2
    p_d = jnp.stack([mx_d, my_d], axis=-1)
    p_u = _undistort_recursive(p_d, c.k1, c.k2, c.p1, c.p2)
    rho2 = jnp.sum(p_u * p_u, axis=-1)
    xi = c.xi
    # lambda such that the lifted point lies on the unit sphere
    lam = (xi + jnp.sqrt(1.0 + (1.0 - xi * xi) * rho2)) / (1.0 + rho2)
    Ps = jnp.concatenate([lam[..., None] * p_u, (lam - xi)[..., None]], axis=-1)
    return Ps / jnp.linalg.norm(Ps, axis=-1, keepdims=True)


def _mei_project(P, c: CameraIntrinsics):
    """`CataCamera::spaceToPlane`: unit-sphere + xi-shift + radtan + K."""
    norm = jnp.linalg.norm(P, axis=-1, keepdims=True)
    Ps = P / jnp.maximum(norm, 1e-12)
    z = Ps[..., 2] + c.xi
    p_u = Ps[..., :2] / jnp.maximum(z, 1e-12)[..., None]
    p_d = p_u + _radtan(p_u, c.k1, c.k2, c.p1, c.p2)
    return jnp.stack(
        [c.gamma1 * p_d[..., 0] + c.u0, c.gamma2 * p_d[..., 1] + c.v0], axis=-1
    )


def _kb_theta_poly(theta, c: CameraIntrinsics):
    t2 = theta * theta
    return theta * (1.0 + t2 * (c.kb_k2 + t2 * (c.kb_k3 + t2 * (c.kb_k4 + t2 * c.kb_k5))))


def _kb_lift(uv, c: CameraIntrinsics, newton_iters: int = 10):
    """`EquidistantCamera::liftProjective`: invert r(theta) by Newton."""
    mx = (uv[..., 0] - c.u0) / c.gamma1
    my = (uv[..., 1] - c.v0) / c.gamma2
    r = jnp.sqrt(mx * mx + my * my)
    theta = jnp.minimum(r, jnp.pi / 2)  # initial guess

    def newton(theta, _):
        t2 = theta * theta
        f = _kb_theta_poly(theta, c) - r
        df = 1.0 + t2 * (3 * c.kb_k2 + t2 * (5 * c.kb_k3 + t2 * (7 * c.kb_k4 + 9 * t2 * c.kb_k5)))
        return theta - f / jnp.maximum(df, 1e-9), None

    theta, _ = jax.lax.scan(newton, theta, None, length=newton_iters)
    phi = jnp.arctan2(my, mx)
    st, ct = jnp.sin(theta), jnp.cos(theta)
    return jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), ct], axis=-1)


def _kb_project(P, c: CameraIntrinsics):
    theta = jnp.arccos(jnp.clip(P[..., 2] / jnp.linalg.norm(P, axis=-1), -1.0, 1.0))
    phi = jnp.arctan2(P[..., 1], P[..., 0])
    r = _kb_theta_poly(theta, c)
    return jnp.stack(
        [c.gamma1 * r * jnp.cos(phi) + c.u0, c.gamma2 * r * jnp.sin(phi) + c.v0],
        axis=-1,
    )


def _scara_lift(uv, c: CameraIntrinsics):
    """`ScaramuzzaCamera::liftProjective`: affine inverse + z = poly(rho)."""
    # invert affine [C D; E 1] (u,v) = A (u', v') + (u0, v0)
    du = uv[..., 0] - c.u0
    dv = uv[..., 1] - c.v0
    inv_det = 1.0 / (c.scara_C - c.scara_D * c.scara_E)
    xp = inv_det * (du - c.scara_D * dv)
    yp = inv_det * (-c.scara_E * du + c.scara_C * dv)
    rho = jnp.sqrt(xp * xp + yp * yp)
    z = jnp.zeros_like(rho)
    for i, a in enumerate(c.scara_poly):
        z = z + a * rho**i
    ray = jnp.stack([xp, yp, z], axis=-1)
    return ray / jnp.maximum(jnp.linalg.norm(ray, axis=-1, keepdims=True), 1e-12)


def _scara_project(P, c: CameraIntrinsics):
    norm_xy = jnp.sqrt(P[..., 0] ** 2 + P[..., 1] ** 2)
    theta = jnp.arctan2(P[..., 2], norm_xy)  # note scaramuzza convention
    rho = jnp.zeros_like(theta)
    for i, a in enumerate(c.scara_inv_poly):
        rho = rho + a * theta**i
    xn = P[..., 0] / jnp.maximum(norm_xy, 1e-12) * rho
    yn = P[..., 1] / jnp.maximum(norm_xy, 1e-12) * rho
    u = xn * c.scara_C + yn * c.scara_D + c.u0
    v = xn * c.scara_E + yn + c.v0
    return jnp.stack([u, v], axis=-1)


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------

_LIFT = {PINHOLE: _pinhole_lift, MEI: _mei_lift,
         KANNALA_BRANDT: _kb_lift, SCARAMUZZA: _scara_lift}
_PROJECT = {PINHOLE: _pinhole_project, MEI: _mei_project,
            KANNALA_BRANDT: _kb_project, SCARAMUZZA: _scara_project}


def lift_projective(uv: jax.Array, cam: CameraIntrinsics) -> jax.Array:
    """Pixel (..., 2) -> unit ray (..., 3) (`Camera::liftProjective`)."""
    return _LIFT[cam.model_type](uv, cam)


def space_to_plane(P: jax.Array, cam: CameraIntrinsics) -> jax.Array:
    """Camera-frame 3D (..., 3) -> pixel (..., 2) (`Camera::spaceToPlane`)."""
    return _PROJECT[cam.model_type](P, cam)


def normalized_plane(uv: jax.Array, cam: CameraIntrinsics) -> jax.Array:
    """Pixel -> undistorted normalized image plane (x/z, y/z) — what the
    feature tracker publishes (`feature_tracker.cpp:298-347`
    undistortedPoints)."""
    ray = lift_projective(uv, cam)
    return ray[..., :2] / jnp.maximum(ray[..., 2:3], 1e-9)
