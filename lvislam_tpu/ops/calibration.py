"""Camera intrinsic calibration — the camera_model package's calibration
tool (`camera_model/src/intrinsic_calib.cc`, `calib/CameraCalibration.cc`,
`CostFunctionFactory.cc`).

The reference detects chessboard corners (OpenCV) then runs a Ceres
reprojection BA over [intrinsics + per-view extrinsics]. Here the optimizer
is the TPU-native part: one batched Gauss-Newton over all views at once
(every reprojection residual lives in a single (V, N, 2) tensor, Jacobians
by forward-mode autodiff, QR solve). Corner detection is input: pass
detected (or synthetic) board corners per view.

Supports the PINHOLE and MEI models (the shipped config's model); the board
is the standard planar grid (object z = 0).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import lie
from ..core.config import CameraIntrinsics
from . import camera


def _project(v: jax.Array, pts_cam: jax.Array, model_type: str):
    """Project camera-frame points with an intrinsics VECTOR:
    pinhole: [fx, fy, cx, cy, k1, k2, p1, p2]
    mei:     [xi, fx, fy, cx, cy, k1, k2, p1, p2]."""
    if model_type == "MEI":
        xi, fx, fy, cx, cy, k1, k2, p1, p2 = (v[i] for i in range(9))
        norm = jnp.linalg.norm(pts_cam, axis=-1, keepdims=True)
        Ps = pts_cam / jnp.maximum(norm, 1e-9)
        z = Ps[..., 2] + xi
        p_u = Ps[..., :2] / jnp.maximum(z, 1e-9)[..., None]
    else:
        fx, fy, cx, cy, k1, k2, p1, p2 = (v[i] for i in range(8))
        p_u = pts_cam[..., :2] / jnp.maximum(pts_cam[..., 2:3], 1e-9)
    d = camera._radtan(p_u, k1, k2, p1, p2)
    p_d = p_u + d
    return jnp.stack([fx * p_d[..., 0] + cx, fy * p_d[..., 1] + cy], axis=-1)


class CalibResult(NamedTuple):
    intrinsics: jax.Array  # parameter vector (see _project)
    rvecs: jax.Array  # (V, 3) board-to-camera rotations
    tvecs: jax.Array  # (V, 3)
    rms_px: jax.Array  # () final reprojection RMS


@partial(jax.jit, static_argnames=("model_type", "iterations"))
def calibrate(
    board_pts: jax.Array,  # (N, 2) planar board coordinates (z = 0)
    image_pts: jax.Array,  # (V, N, 2) detected corners per view
    valid: jax.Array,  # (V, N)
    intr0: jax.Array,  # initial intrinsics vector
    rvecs0: jax.Array,  # (V, 3) initial board poses
    tvecs0: jax.Array,  # (V, 3)
    model_type: str = "PINHOLE",
    iterations: int = 15,
) -> CalibResult:
    V, N, _ = image_pts.shape
    D_int = intr0.shape[0]
    D = D_int + 6 * V
    obj = jnp.concatenate([board_pts, jnp.zeros((N, 1), board_pts.dtype)], axis=-1)

    def unpack(x):
        return x[:D_int], x[D_int : D_int + 3 * V].reshape(V, 3), x[D_int + 3 * V :].reshape(V, 3)

    def residuals(x):
        intr, rv, tv = unpack(x)

        def one(rvec, tvec, uv, ok):
            R = lie.so3_exp(rvec)
            pc = obj @ R.T + tvec[None]
            proj = _project(intr, pc, model_type)
            return jnp.where(ok[:, None], proj - uv, 0.0)

        return jax.vmap(one)(rv, tv, image_pts, valid).reshape(-1)

    x0 = jnp.concatenate([intr0, rvecs0.reshape(-1), tvecs0.reshape(-1)])

    def gn(carry, _):
        x, lam = carry
        r = residuals(x)
        J = jax.jacfwd(residuals)(x)
        col = jnp.linalg.norm(J, axis=0) + 1e-6
        A = jnp.concatenate([J, jnp.sqrt(lam) * jnp.diag(col)], axis=0)
        b = jnp.concatenate([-r, jnp.zeros(D, x.dtype)])
        Q, R = jnp.linalg.qr(A)
        d = jax.scipy.linalg.solve_triangular(
            R + 1e-9 * jnp.eye(D, dtype=x.dtype), Q.T @ b, lower=False
        )
        x2 = x + d
        better = jnp.sum(residuals(x2) ** 2) < jnp.sum(r * r)
        x = jnp.where(better, x2, x)
        lam = jnp.where(better, lam / 3.0, lam * 10.0)
        return (x, lam), None

    (x, _), _ = jax.lax.scan(gn, (x0, jnp.asarray(1e-3, x0.dtype)), None,
                             length=iterations)
    r = residuals(x)
    n_obs = jnp.maximum(jnp.sum(valid), 1)
    rms = jnp.sqrt(jnp.sum(r * r) / (2.0 * n_obs))
    intr, rv, tv = unpack(x)
    return CalibResult(intrinsics=intr, rvecs=rv, tvecs=tv, rms_px=rms)
