"""Batched pyramidal Lucas-Kanade optical flow.

The TPU replacement for the reference's GPU front-end tracker — cv::cuda::
SparsePyrLKOpticalFlow with 21x21 windows, 3 pyramid levels, 30 iterations
(`feature_tracker/src/feature_tracker.cpp:115-135`; CPU fallback `:110-113`).

Design: all MAX_CNT features advance together. Per level, the template
patches + Scharr gradients are one batched bilinear gather; the 2x2 normal
matrix is precomputed per feature; each LK iteration is a gather + two
reductions — a `lax.scan` whose body is pure VPU work, batched over the
feature axis. Status follows OpenCV: a feature fails if its patch leaves the
image or the normal matrix is degenerate.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import image as imops


class KLTResult(NamedTuple):
    pts: jax.Array  # (N, 2) tracked positions in level-0 pixels
    status: jax.Array  # (N,) bool
    err: jax.Array  # (N,) mean absolute residual of final window


def _track_level(
    prev_img, next_img, prev_pts, guess_pts, valid,
    half: int, iters: int, min_eig_thresh: float = 1e-4,
):
    """One pyramid level of iterative LK. All coords in this level's pixels."""
    H, W = prev_img.shape
    k = 2 * half + 1

    gx, gy = imops.scharr_gradients(prev_img)
    T = imops.extract_patches(prev_img, prev_pts, half)  # (N, k, k)
    Gx = imops.extract_patches(gx, prev_pts, half)
    Gy = imops.extract_patches(gy, prev_pts, half)

    a11 = jnp.sum(Gx * Gx, axis=(1, 2))
    a12 = jnp.sum(Gx * Gy, axis=(1, 2))
    a22 = jnp.sum(Gy * Gy, axis=(1, 2))
    det = a11 * a22 - a12 * a12
    tr = a11 + a22
    min_eig = (tr - jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0))) / (2.0 * k * k)
    ok0 = valid & (min_eig > min_eig_thresh)
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-12, det, jnp.inf)

    def body(pts, _):
        J = imops.extract_patches(next_img, pts, half)
        dI = J - T
        b1 = jnp.sum(dI * Gx, axis=(1, 2))
        b2 = jnp.sum(dI * Gy, axis=(1, 2))
        dx = -(a22 * b1 - a12 * b2) * inv_det
        dy = -(-a12 * b1 + a11 * b2) * inv_det
        step = jnp.stack([dx, dy], axis=-1)
        step = jnp.where(ok0[:, None], step, 0.0)
        return pts + step, None

    pts, _ = jax.lax.scan(body, guess_pts, None, length=iters)

    inb = (
        (pts[:, 0] > half) & (pts[:, 0] < W - 1 - half)
        & (pts[:, 1] > half) & (pts[:, 1] < H - 1 - half)
    )
    J = imops.extract_patches(next_img, pts, half)
    err = jnp.mean(jnp.abs(J - T), axis=(1, 2))
    return pts, ok0 & inb, err


@partial(jax.jit, static_argnames=("levels", "half", "iters"))
def track(
    prev_img: jax.Array,  # (H, W) float
    next_img: jax.Array,
    prev_pts: jax.Array,  # (N, 2) level-0 pixel coords
    valid: jax.Array,  # (N,)
    levels: int = 3,
    half: int = 10,  # 21x21 window
    iters: int = 30,
) -> KLTResult:
    """Pyramidal LK: coarse-to-fine over `levels`+1 images."""
    prev_pyr = imops.build_pyramid(prev_img, levels)
    next_pyr = imops.build_pyramid(next_img, levels)

    scale = 2.0**levels
    pts = prev_pts / scale
    status = valid
    err = jnp.zeros(prev_pts.shape[0], prev_img.dtype)
    for lvl in range(levels, -1, -1):
        s = 2.0**lvl
        p_lvl = prev_pts / s
        pts, ok, err = _track_level(
            prev_pyr[lvl], next_pyr[lvl], p_lvl, pts, status, half, iters
        )
        status = ok
        if lvl > 0:
            pts = pts * 2.0
    return KLTResult(pts=pts, status=status, err=err)
