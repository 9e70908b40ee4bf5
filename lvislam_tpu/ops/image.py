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


def _axis_conv(img: jax.Array, k, axis: int) -> jax.Array:
    """1D convolution along `axis` with edge padding, as K static shifted
    adds — XLA fuses them into one elementwise pass. (TPU lowers 1-channel
    `conv_general_dilated` to a pathologically slow path: a 5-tap separable
    blur on 1024x576 measured ~15 ms as conv, ~0.1 ms as shifts.)"""
    K = len(k)
    pad = K // 2
    width = [(0, 0), (0, 0)]
    width[axis] = (pad, pad)
    x = jnp.pad(img, width, mode="edge")
    H, W = img.shape
    out = None
    for i in range(K):
        sl = (
            slice(i, i + H) if axis == 0 else slice(None),
            slice(i, i + W) if axis == 1 else slice(None),
        )
        term = x[sl] * k[i]
        out = term if out is None else out + term
    return out


def _sep_conv(img: jax.Array, k: jax.Array) -> jax.Array:
    """Separable 2D convolution with edge padding, (H, W) x (K,)."""
    return _axis_conv(_axis_conv(img, list(k), 0), list(k), 1)


_GAUSS5 = jnp.array([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0


def _shift_edge(x: jax.Array, i: int, axis: int) -> jax.Array:
    """Shift by i along `axis` with edge clamp, as concat of aligned slices
    (no odd-size pad — `jnp.pad` to (H+4, W+4) forces a relayout on TPU
    that measured ~2 ms/level at 1024x576; these stay at floor cost)."""
    if i == 0:
        return x
    if axis == 0:
        if i > 0:
            return jnp.concatenate([jnp.repeat(x[:1], i, 0), x[:-i]], 0)
        return jnp.concatenate([x[-i:], jnp.repeat(x[-1:], -i, 0)], 0)
    if i > 0:
        return jnp.concatenate([jnp.repeat(x[:, :1], i, 1), x[:, :-i]], 1)
    return jnp.concatenate([x[:, -i:], jnp.repeat(x[:, -1:], -i, 1)], 1)


def pyr_down(img: jax.Array) -> jax.Array:
    """Gaussian blur + 2x decimation (cv::pyrDown equivalent, edge-clamped
    borders). Polyphase form: the vertical 5-tap runs as edge-clamped
    shifted adds then decimates rows; the horizontal pass decimates FIRST
    into even/odd phases and combines them (5 shifted adds on half-width
    arrays), with the two border columns patched to exact edge-clamp
    values. Bit-matches the previous pad-based `_sep_conv(...)[::2, ::2]`
    up to fp reassociation (~1e-7); ~2.2x faster per level on TPU."""
    k = _GAUSS5.astype(img.dtype)
    if img.shape[1] % 2:  # odd width: even/odd phases misalign — rare, use
        return _sep_conv(img, k)[::2, ::2]  # the general pad-based path
    xv = (
        _shift_edge(img, 2, 0) * k[0] + _shift_edge(img, 1, 0) * k[1]
        + img * k[2]
        + _shift_edge(img, -1, 0) * k[3] + _shift_edge(img, -2, 0) * k[4]
    )[::2]
    e, o = xv[:, ::2], xv[:, 1::2]
    out = (
        _shift_edge(e, 1, 1) * k[0] + _shift_edge(o, 1, 1) * k[1]
        + e * k[2] + o * k[3] + _shift_edge(e, -1, 1) * k[4]
    )
    # border columns: the clamped phases pick in[1]/in[W-2] where true edge
    # clamp wants in[0]/in[W-1]
    left = xv[:, 0] * (k[0] + k[1] + k[2]) + xv[:, 1] * k[3] + xv[:, 2] * k[4]
    right = (
        xv[:, -4] * k[0] + xv[:, -3] * k[1] + xv[:, -2] * k[2]
        + xv[:, -1] * (k[3] + k[4])
    )
    return out.at[:, 0].set(left).at[:, -1].set(right)


def build_pyramid(img: jax.Array, levels: int):
    """List of `levels`+1 images, level 0 = full resolution."""
    pyr = [img]
    for _ in range(levels):
        pyr.append(pyr_down(pyr[-1]))
    return pyr


def scharr_gradients(img: jax.Array):
    """Scharr 3x3 x/y gradients (OpenCV LK uses Scharr-like derivatives).

    `_axis_conv` is cross-correlation (like `conv_general_dilated`), so the
    derivative tap [-1, 0, 1] yields gx = img(x+1) - img(x-1), identical to
    the previous conv formulation."""
    kd = [-1.0, 0.0, 1.0]
    ks = [3.0 / 32.0, 10.0 / 32.0, 3.0 / 32.0]
    gx = _axis_conv(_axis_conv(img, ks, 0), kd, 1)
    gy = _axis_conv(_axis_conv(img, ks, 1), kd, 0)
    return gx, gy


def sobel_gradients(img: jax.Array):
    kd = [-0.5, 0.0, 0.5]
    ks = [0.25, 0.5, 0.25]
    gx = _axis_conv(_axis_conv(img, ks, 0), kd, 1)
    gy = _axis_conv(_axis_conv(img, ks, 1), kd, 0)
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
          n_bins: int = 256, use_pallas: bool | None = None) -> jax.Array:
    """Contrast-limited adaptive histogram equalization (cv::CLAHE
    equivalent, `feature_tracker.cpp:86-92`: clipLimit 3.0, 8x8 tiles).
    Tile histograms are clipped + redistributed; per-pixel lookup bilinearly
    interpolates the 4 surrounding tile CDFs.

    TPU form: the per-pixel scatter histogram and the 4-tap CDF table
    gather (2.4M scattered taps, ~30 ms at 1024x576) are both replaced by a
    loop over bins. On lane-friendly shapes that loop runs as Pallas
    kernels with VMEM-resident accumulators (`ops.pallas_clahe`, one image
    read total); otherwise as a `lax.scan` whose every iteration is one
    fused compare+reduce for the histogram and one (H,T)@(T,T)@(T,W)
    CDF-field upsample matmul for the application (~1.8 GB of HBM
    accumulator traffic at 1024x576 — the fallback, not the fast path)."""
    H, W = img.shape
    th, tw = H // tiles, W // tiles
    if use_pallas is None:
        use_pallas = (
            jax.default_backend() not in ("cpu",)
            and H % tiles == 0 and W % tiles == 0
            and tw % 128 == 0 and th % 8 == 0 and tiles >= 3
        )
    imgc = img[: th * tiles, : tw * tiles]
    x = jnp.clip(imgc, 0.0, 1.0) * (n_bins - 1)

    if use_pallas:
        from . import pallas_clahe

        hist = pallas_clahe.tile_hist(
            x.astype(jnp.int32), tiles=tiles, n_bins=n_bins
        )  # (T*T, B), tile row-major
    else:
        # int8-coded bins (b - 128) keep the 256 compare passes at 1 B/pixel
        b8 = (x.astype(jnp.int32) - 128).astype(jnp.int8)
        b8t = b8.reshape(tiles, th, tiles, tw)

        def hist_bin(_, b):
            m = (b8t == (b - 128).astype(jnp.int8)).astype(jnp.float32)
            return None, jnp.sum(m, axis=(1, 3))  # (tiles, tiles)

        _, hist = jax.lax.scan(hist_bin, None, jnp.arange(n_bins))  # (B,T,T)
        hist = hist.reshape(n_bins, tiles * tiles).T
    # clip + redistribute
    limit = clip_limit * (th * tw) / n_bins
    excess = jnp.sum(jnp.maximum(hist - limit, 0.0), axis=1, keepdims=True)
    hist = jnp.minimum(hist, limit) + excess / n_bins
    cdf = jnp.cumsum(hist, axis=1)
    cdf = cdf / jnp.maximum(cdf[:, -1:], 1.0)  # (T*T, n_bins) in [0,1]
    cdf = cdf.reshape(tiles, tiles, n_bins).transpose(2, 0, 1)  # (B, T, T)

    # static bilinear tile-CDF upsample operators: field_b = Uy @ cdf_b @ Ux^T
    def lerp_mat(n, t, span):
        cc = (jnp.arange(n, dtype=jnp.float32) + 0.5) / span - 0.5
        i0 = jnp.clip(jnp.floor(cc).astype(jnp.int32), 0, t - 1)
        i1 = jnp.clip(i0 + 1, 0, t - 1)
        f = jnp.clip(cc - i0, 0.0, 1.0)
        r = jnp.arange(n)
        return (
            jnp.zeros((n, t), jnp.float32)
            .at[r, i0].add(1.0 - f)
            .at[r, i1].add(f)
        )

    Uy = lerp_mat(H, tiles, th)  # (H, T)
    Ux = lerp_mat(W, tiles, tw)  # (W, T)

    if use_pallas:
        from . import pallas_clahe

        # x-pass precomputed: VxT[t, b, x] = sum_s Ux[x, s] cdf[t, s, b]
        cdf3 = cdf.transpose(1, 2, 0)  # (B, Ty, Tx) -> (Ty, Tx, B)
        vxt = jnp.einsum("ws,tsb->tbw", Ux, cdf3)
        # per-row 3-tap weights over tile rows {bi, bi+1, bi+2} of the
        # row's block (bi = clip(block-1, 0, T-3)); rows of block i only
        # interpolate tile rows i-1/i/i+1, so the triple always covers the
        # exact 2-tap pair of lerp_mat
        y = jnp.arange(H)
        cc = (y.astype(jnp.float32) + 0.5) / th - 0.5
        t0 = jnp.clip(jnp.floor(cc).astype(jnp.int32), 0, tiles - 2)
        f = jnp.clip(cc - t0, 0.0, 1.0)
        bi = jnp.clip(y // th - 1, 0, tiles - 3)
        wy3 = (
            jnp.zeros((H, 3), jnp.float32)
            .at[y, t0 - bi].add(1.0 - f)
            .at[y, t0 + 1 - bi].add(f)
        )
        bins_full = (jnp.clip(img, 0.0, 1.0) * (n_bins - 1)).astype(jnp.int32)
        out = pallas_clahe.apply_lut(
            bins_full, wy3, vxt, tiles=tiles, n_bins=n_bins
        )
        return out.astype(img.dtype)

    bi8 = (
        (jnp.clip(img, 0.0, 1.0) * (n_bins - 1)).astype(jnp.int32) - 128
    ).astype(jnp.int8)

    def apply_bin(acc, args):
        b, cdf_b = args
        field = (Uy @ cdf_b) @ Ux.T  # (H, W) interpolated CDF at bin b
        return acc + jnp.where(bi8 == (b - 128).astype(jnp.int8), field, 0.0), None

    out, _ = jax.lax.scan(
        apply_bin, jnp.zeros((H, W), jnp.float32), (jnp.arange(n_bins), cdf)
    )
    return out.astype(img.dtype)
