"""Chessboard inner-corner detection for camera calibration.

The reference's calibration tool detects corners with OpenCV
`findChessboardCorners` + `cornerSubPix` (`camera_model/src/chessboard/
Chessboard.cc`, driven by `src/intrinsic_calib.cc`) and feeds them to a
Ceres intrinsic solve. TPU-first equivalent: a fixed-shape saddle-point
detector — chessboard inner corners are the strongest saddle points of the
smoothed image, so `-det(Hessian)` peaks exactly there — with quadratic
subpixel refinement and a rank-based grid ordering. The detected board
feeds `ops.calibration.calibrate`.

Scope note: ordering uses the PCA axes of the detected lattice and
order-statistics row splitting, which handles mild perspective (calibration
imagery); the reference's full quad-graph recovery for extreme oblique
views is out of scope.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _gauss_kernel(sigma: float, radius: int) -> jnp.ndarray:
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def _sep_conv(img: jax.Array, k: jnp.ndarray) -> jax.Array:
    """Separable 2-d convolution with reflect padding (H, W)."""
    r = (k.shape[0] - 1) // 2
    p = jnp.pad(img, ((r, r), (0, 0)), mode="reflect")
    img = jax.vmap(lambda col: jnp.convolve(col, k, mode="valid"),
                   in_axes=1, out_axes=1)(p)
    p = jnp.pad(img, ((0, 0), (r, r)), mode="reflect")
    return jax.vmap(lambda row: jnp.convolve(row, k, mode="valid"))(p)


def saddle_response(img: jax.Array, sigma: float = 2.0) -> jax.Array:
    """-det(Hessian) of the Gaussian-smoothed image: large and positive at
    checker saddle points, negative at blobs/edges."""
    g = _sep_conv(img.astype(jnp.float32), _gauss_kernel(sigma, int(3 * sigma)))
    ixx = g[:, 2:] - 2 * g[:, 1:-1] + g[:, :-2]
    ixx = jnp.pad(ixx, ((0, 0), (1, 1)))
    iyy = g[2:, :] - 2 * g[1:-1, :] + g[:-2, :]
    iyy = jnp.pad(iyy, ((1, 1), (0, 0)))
    ix = jnp.pad((g[:, 2:] - g[:, :-2]) * 0.5, ((0, 0), (1, 1)))
    ixy = jnp.pad((ix[2:, :] - ix[:-2, :]) * 0.5, ((1, 1), (0, 0)))
    return ixy * ixy - ixx * iyy


def _nms(resp: jax.Array, radius: int) -> jax.Array:
    """Keep strict local maxima within a (2r+1)^2 window."""
    mx = jax.lax.reduce_window(
        resp, -jnp.inf, jax.lax.max,
        (2 * radius + 1, 2 * radius + 1), (1, 1), "SAME",
    )
    return resp >= mx


@partial(jax.jit, static_argnames=("rows", "cols", "sigma", "nms_radius"))
def find_chessboard(
    img: jax.Array,  # (H, W) grayscale, any numeric dtype
    rows: int,
    cols: int,
    sigma: float = 2.0,
    nms_radius: int = 5,
):
    """Detect a (rows x cols) inner-corner grid.

    Returns (corners (rows*cols, 2) float32 [x, y] ordered row-major along
    the board axes, found: bool). `found` is False when the top responses
    don't form a clean rows x cols lattice (ratio test on the weakest
    accepted corner vs the next candidate).
    """
    H, W = img.shape
    n = rows * cols
    resp = saddle_response(img, sigma)
    # suppress the border band (second derivatives there are pad artifacts)
    b = max(3, int(2 * sigma))
    mask = jnp.zeros((H, W), bool).at[b:H - b, b:W - b].set(True)
    resp = jnp.where(mask & _nms(resp, nms_radius), resp, -jnp.inf)

    flat = resp.ravel()
    top_v, top_i = jax.lax.top_k(flat, n + 1)
    iy = (top_i // W).astype(jnp.float32)
    ix = (top_i % W).astype(jnp.float32)

    # found-test: the n-th strongest corner must dominate the (n+1)-th
    # (a real board has exactly n saddle points far above clutter)
    found = (top_v[n - 1] > 0) & (top_v[n - 1] > 2.5 * jnp.maximum(top_v[n], 0))

    # quadratic subpixel refinement on the response surface
    yi = top_i[:n] // W
    xi = top_i[:n] % W

    def refine(y, x):
        nb = jax.lax.dynamic_slice(resp, (y - 1, x - 1), (3, 3))
        dx = (nb[1, 2] - nb[1, 0]) * 0.5
        dy = (nb[2, 1] - nb[0, 1]) * 0.5
        dxx = nb[1, 2] - 2 * nb[1, 1] + nb[1, 0]
        dyy = nb[2, 1] - 2 * nb[1, 1] + nb[0, 1]
        dxy = (nb[2, 2] - nb[2, 0] - nb[0, 2] + nb[0, 0]) * 0.25
        det = dxx * dyy - dxy * dxy
        ox = jnp.where(jnp.abs(det) > 1e-9, -(dyy * dx - dxy * dy) / det, 0.0)
        oy = jnp.where(jnp.abs(det) > 1e-9, -(dxx * dy - dxy * dx) / det, 0.0)
        ox = jnp.clip(ox, -1.0, 1.0)
        oy = jnp.clip(oy, -1.0, 1.0)
        return jnp.stack([x + ox, y + oy])

    pts = jax.vmap(refine)(jnp.clip(yi, 1, H - 2), jnp.clip(xi, 1, W - 2))
    pts = pts.astype(jnp.float32)  # (n, 2) [x, y]

    # --- order into a row-major grid along the board's own axes ---
    c = pts - jnp.mean(pts, axis=0)
    cov = c.T @ c
    # closed-form 2x2 eigenvectors; v1 = major axis (more columns direction
    # when cols >= rows, since spread is larger along it)
    tr, d = cov[0, 0] + cov[1, 1], cov[0, 0] * cov[1, 1] - cov[0, 1] * cov[1, 0]
    lam1 = 0.5 * tr + jnp.sqrt(jnp.maximum(0.25 * tr * tr - d, 0.0))
    v1 = jnp.stack([cov[0, 1], lam1 - cov[0, 0]])
    v1 = jnp.where(jnp.linalg.norm(v1) < 1e-9,
                   jnp.array([1.0, 0.0], pts.dtype), v1)
    v1 = v1 / jnp.linalg.norm(v1)
    v2 = jnp.stack([-v1[1], v1[0]])
    long_is_cols = cols >= rows
    a = c @ (v1 if long_is_cols else v2)  # along-row coordinate
    bb = c @ (v2 if long_is_cols else v1)  # across-row coordinate

    # rows by order statistics (counts are known), then sort inside each row
    row_order = jnp.argsort(bb)
    a_rows = a[row_order].reshape(rows, cols)
    inrow = jnp.argsort(a_rows, axis=1)
    order = row_order.reshape(rows, cols)[jnp.arange(rows)[:, None], inrow]
    ordered = pts[order.reshape(-1)]

    # canonicalize: first corner is the one closest to the image origin
    flip = jnp.sum(ordered[0] ** 2) > jnp.sum(ordered[-1] ** 2)
    ordered = jnp.where(flip, ordered[::-1], ordered)
    return ordered, found


def board_object_points(rows: int, cols: int, square: float) -> jnp.ndarray:
    """(rows*cols, 3) planar board coordinates matching `find_chessboard`'s
    row-major ordering (z = 0), `square` metres per cell."""
    jj, ii = jnp.meshgrid(jnp.arange(cols), jnp.arange(rows))
    return jnp.stack(
        [jj.ravel() * square, ii.ravel() * square, jnp.zeros(rows * cols)],
        axis=-1,
    ).astype(jnp.float32)
