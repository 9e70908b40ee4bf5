"""Image primitives for the visual front-end: pyramids, gradients, bilinear
sampling, CLAHE-style equalization.

These feed `ops.klt` (pyramidal Lucas-Kanade) and `ops.gftt` (Shi-Tomasi),
the TPU replacements for the reference's cv::cuda SparsePyrLKOpticalFlow /
GoodFeaturesToTrackDetector calls (`feature_tracker/src/feature_tracker.cpp:
110-191`). Everything is fixed-shape and fused: pyramid levels are separable
convolutions, patch extraction is one batched bilinear gather.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _sep_conv(img: jax.Array, k: jax.Array) -> jax.Array:
    """Separable 2D convolution with reflect padding, (H, W) x (K,)."""
    pad = k.shape[0] // 2
    x = jnp.pad(img, ((pad, pad), (0, 0)), mode="edge")
    x = jax.lax.conv_general_dilated(
        x[None, None], k[::-1][None, None, :, None],
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[0, 0]
    x = jnp.pad(x, ((0, 0), (pad, pad)), mode="edge")
    x = jax.lax.conv_general_dilated(
        x[None, None], k[::-1][None, None, None, :],
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[0, 0]
    return x


_GAUSS5 = jnp.array([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0


def pyr_down(img: jax.Array) -> jax.Array:
    """Gaussian blur + 2x decimation (cv::pyrDown equivalent)."""
    return _sep_conv(img, _GAUSS5.astype(img.dtype))[::2, ::2]


def build_pyramid(img: jax.Array, levels: int):
    """List of `levels`+1 images, level 0 = full resolution."""
    pyr = [img]
    for _ in range(levels):
        pyr.append(pyr_down(pyr[-1]))
    return pyr


def scharr_gradients(img: jax.Array):
    """Scharr 3x3 x/y gradients (OpenCV LK uses Scharr-like derivatives)."""
    kd = jnp.array([-1.0, 0.0, 1.0], img.dtype)
    ks = jnp.array([3.0, 10.0, 3.0], img.dtype) / 32.0
    pad = 1
    x = jnp.pad(img, pad, mode="edge")
    gx = jax.lax.conv_general_dilated(
        x[None, None], (ks[:, None] * kd[None, :])[None, None],
        (1, 1), "VALID", dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[0, 0]
    gy = jax.lax.conv_general_dilated(
        x[None, None], (kd[:, None] * ks[None, :])[None, None],
        (1, 1), "VALID", dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[0, 0]
    return gx, gy


def sobel_gradients(img: jax.Array):
    kd = jnp.array([-1.0, 0.0, 1.0], img.dtype) / 2.0
    ks = jnp.array([1.0, 2.0, 1.0], img.dtype) / 4.0
    x = jnp.pad(img, 1, mode="edge")
    gx = jax.lax.conv_general_dilated(
        x[None, None], (ks[:, None] * kd[None, :])[None, None],
        (1, 1), "VALID", dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[0, 0]
    gy = jax.lax.conv_general_dilated(
        x[None, None], (kd[:, None] * ks[None, :])[None, None],
        (1, 1), "VALID", dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[0, 0]
    return gx, gy


def bilinear_sample(img: jax.Array, xy: jax.Array) -> jax.Array:
    """Bilinear interpolation of (H, W) at float coords xy (..., 2) in
    (x, y) pixel convention. Out-of-bounds clamps to the border."""
    H, W = img.shape
    x = jnp.clip(xy[..., 0], 0.0, W - 1.001)
    y = jnp.clip(xy[..., 1], 0.0, H - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    i00 = img[y0, x0]
    i01 = img[y0, x0 + 1]
    i10 = img[y0 + 1, x0]
    i11 = img[y0 + 1, x0 + 1]
    return (
        i00 * (1 - fx) * (1 - fy)
        + i01 * fx * (1 - fy)
        + i10 * (1 - fx) * fy
        + i11 * fx * fy
    )


def extract_patches(img: jax.Array, centers: jax.Array, half: int):
    """Batched bilinear patch extraction: (N, 2) float centers ->
    (N, 2*half+1, 2*half+1) patches."""
    k = 2 * half + 1
    off = jnp.arange(k, dtype=img.dtype) - half
    ox, oy = jnp.meshgrid(off, off)  # (k, k): x varies along cols
    coords = centers[:, None, None, :] + jnp.stack([ox, oy], axis=-1)[None]
    return bilinear_sample(img, coords)


def equalize_hist(img: jax.Array, n_bins: int = 256) -> jax.Array:
    """Global histogram equalization — the capability stand-in for the
    reference's CLAHE(3.0, 8x8) (`feature_tracker.cpp:86-92`); tile-adaptive
    variant can layer on top with the same primitives."""
    flat = img.reshape(-1)
    scaled = jnp.clip(flat, 0.0, 1.0) * (n_bins - 1)
    hist = jnp.zeros(n_bins, jnp.float32).at[scaled.astype(jnp.int32)].add(1.0)
    cdf = jnp.cumsum(hist)
    cdf = (cdf - cdf[0]) / jnp.maximum(cdf[-1] - cdf[0], 1.0)
    return cdf[scaled.astype(jnp.int32)].reshape(img.shape).astype(img.dtype)


def clahe(img: jax.Array, clip_limit: float = 3.0, tiles: int = 8,
          n_bins: int = 256) -> jax.Array:
    """Contrast-limited adaptive histogram equalization (cv::CLAHE
    equivalent, `feature_tracker.cpp:86-92`: clipLimit 3.0, 8x8 tiles).
    Tile histograms are clipped + redistributed; per-pixel lookup bilinearly
    interpolates the 4 surrounding tile CDFs."""
    H, W = img.shape
    th, tw = H // tiles, W // tiles
    imgc = img[: th * tiles, : tw * tiles]
    x = jnp.clip(imgc, 0.0, 1.0) * (n_bins - 1)
    bins = x.astype(jnp.int32)
    tile_ids = (
        (jnp.arange(th * tiles)[:, None] // th) * tiles
        + (jnp.arange(tw * tiles)[None, :] // tw)
    )
    flat_ids = tile_ids.reshape(-1) * n_bins + bins.reshape(-1)
    hist = jnp.zeros(tiles * tiles * n_bins, jnp.float32).at[flat_ids].add(1.0)
    hist = hist.reshape(tiles * tiles, n_bins)
    # clip + redistribute
    limit = clip_limit * (th * tw) / n_bins
    excess = jnp.sum(jnp.maximum(hist - limit, 0.0), axis=1, keepdims=True)
    hist = jnp.minimum(hist, limit) + excess / n_bins
    cdf = jnp.cumsum(hist, axis=1)
    cdf = cdf / jnp.maximum(cdf[:, -1:], 1.0)  # (T*T, n_bins) in [0,1]
    cdf = cdf.reshape(tiles, tiles, n_bins)

    # bilinear interpolation between tile CDFs
    yy = (jnp.arange(H)[:, None] + 0.5) / th - 0.5
    xx = (jnp.arange(W)[None, :] + 0.5) / tw - 0.5
    y0 = jnp.clip(jnp.floor(yy).astype(jnp.int32), 0, tiles - 1)
    x0 = jnp.clip(jnp.floor(xx).astype(jnp.int32), 0, tiles - 1)
    y1 = jnp.clip(y0 + 1, 0, tiles - 1)
    x1 = jnp.clip(x0 + 1, 0, tiles - 1)
    fy = jnp.clip(yy - y0, 0.0, 1.0)
    fx = jnp.clip(xx - x0, 0.0, 1.0)
    b = jnp.clip(img, 0.0, 1.0) * (n_bins - 1)
    bi = b.astype(jnp.int32)
    y0b = jnp.broadcast_to(y0, (H, W))
    y1b = jnp.broadcast_to(y1, (H, W))
    x0b = jnp.broadcast_to(x0, (H, W))
    x1b = jnp.broadcast_to(x1, (H, W))
    v00 = cdf[y0b, x0b, bi]
    v01 = cdf[y0b, x1b, bi]
    v10 = cdf[y1b, x0b, bi]
    v11 = cdf[y1b, x1b, bi]
    out = (
        v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy + v11 * fx * fy
    )
    return out.astype(img.dtype)
