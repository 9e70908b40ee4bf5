"""Shi-Tomasi corner detection with grid non-max suppression.

TPU replacement for the reference's cv::cuda GoodFeaturesToTrackDetector /
cv::goodFeaturesToTrack refill (`feature_tracker/src/feature_tracker.cpp:
162-191`) and the mask-circle min-distance suppression (`setMask`,
`:36-69`): the min-dist circles become a min_dist x min_dist grid — one
response maximum per cell, cells near existing tracked features excluded —
which enforces (Chebyshev) separation in one vectorized pass instead of a
sequential mask paint.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import image as imops


def shi_tomasi_response(img: jax.Array, block: int = 3) -> jax.Array:
    """Min-eigenvalue corner response of the structure tensor."""
    gx, gy = imops.sobel_gradients(img)
    k = jnp.ones(block, img.dtype) / block
    sxx = imops._sep_conv(gx * gx, k)
    sxy = imops._sep_conv(gx * gy, k)
    syy = imops._sep_conv(gy * gy, k)
    tr = sxx + syy
    det = sxx * syy - sxy * sxy
    return (tr - jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0))) / 2.0


@partial(jax.jit, static_argnames=("max_pts", "cell"))
def detect(
    img: jax.Array,  # (H, W) float
    existing_pts: jax.Array,  # (M, 2) current tracked feature pixels
    existing_valid: jax.Array,  # (M,)
    max_pts: int,
    cell: int = 20,  # MIN_DIST
    quality_level: float = 0.01,
    border: int = 10,
):
    """Returns (pts (max_pts, 2), valid (max_pts,)) new corners."""
    H, W = img.shape
    resp = shi_tomasi_response(img)
    # zero the border (reference BORDER_SIZE culling, `inBorder` `:12-18`)
    yy = jnp.arange(H)[:, None]
    xx = jnp.arange(W)[None, :]
    inb = (yy >= border) & (yy < H - border) & (xx >= border) & (xx < W - border)
    resp = jnp.where(inb, resp, 0.0)

    gh, gw = H // cell, W // cell
    rc = resp[: gh * cell, : gw * cell].reshape(gh, cell, gw, cell)
    cell_max = rc.max(axis=(1, 3))  # (gh, gw)
    flat_arg = jnp.argmax(rc.transpose(0, 2, 1, 3).reshape(gh, gw, cell * cell), axis=-1)
    off_y = flat_arg // cell
    off_x = flat_arg % cell
    py = jnp.arange(gh)[:, None] * cell + off_y
    px = jnp.arange(gw)[None, :] * cell + off_x

    # cells already occupied by a tracked feature are excluded
    ex = jnp.where(existing_valid[:, None], existing_pts, -1e6)
    exc = jnp.zeros((gh, gw), bool)
    cx = jnp.clip((ex[:, 0] // cell).astype(jnp.int32), 0, gw - 1)
    cy = jnp.clip((ex[:, 1] // cell).astype(jnp.int32), 0, gh - 1)
    exc = exc.at[cy, cx].set(existing_valid, mode="drop")

    thresh = quality_level * jnp.max(resp)
    good = (cell_max > thresh) & (~exc)
    score = jnp.where(good, cell_max, -jnp.inf).reshape(-1)
    top, sel = jax.lax.top_k(score, max_pts)
    sel_y = py.reshape(-1)[sel]
    sel_x = px.reshape(-1)[sel]
    pts = jnp.stack([sel_x, sel_y], axis=-1).astype(img.dtype)
    return pts, top > -jnp.inf
