"""Sparse pyramidal Lucas-Kanade feature tracking.

TPU re-design of the reference's `cv::cuda::SparsePyrLKOpticalFlow`
(`feature_tracker/src/feature_tracker.cpp:115-135`). The textbook
formulation bilinear-gathers a window from the full image EVERY iteration
(N·k²·4 scattered taps × iters × levels) — on TPU that is ~60 ns/tap of
HBM-latency-bound gather (~370 ms/frame at the shipped 1024x576, 150
features). This implementation is gather-once / matmul-always:

1. Per level, each feature's neighborhood is fetched ONCE as aligned
   128-lane row blocks (one (N·S, 2, 128) row gather — the only scattered
   memory access), then compacted to an (N, S, S) VMEM-resident patch by a
   per-point column-selection matmul.
2. Bilinear sampling at a subpixel offset is a LINEAR operator: a k-row
   selection matrix Sy (k, S) and column matrix Sx (k, S) with triangular
   (two-tap) weights. Every LK iteration evaluates its warped window as
   J = Sy @ P @ Sxᵀ — two tiny batched matmuls on the MXU instead of k²
   scattered taps. 30 iterations cost ~100 MFLOP total, not 2M gathers.
3. Template values AND Scharr gradients are computed inside the patch
   (static slices of the (N, S, S) tensor), never against the full image.

Semantics match cv::calcOpticalFlowPyrLK with one documented deviation:
an iterate that drifts more than the patch margin (S/2 - half - 2 px)
from its per-level initial guess fails (status=false) instead of being
re-gathered — with the coarse-to-fine pyramid the guess lands within a
few px, so this only drops features the pyramid already mistracked.
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


def _row_block_patches(img: jax.Array, corners: jax.Array, S: int):
    """Fetch (N, S, S) integer-cornered patches with ONE row-block gather.

    corners: (N, 2) int32 top-left (x0, y0), pre-clipped to [0, W-S]x[0, H-S].
    The image is viewed as (H, nb, 128) lane blocks; each patch row lives in
    at most two consecutive blocks (S <= 96 guarantees coverage), which are
    gathered as whole 128-lane rows and then compacted to S columns by a
    per-point selection matmul (the lane-shift the VPU cannot do)."""
    H, W = img.shape
    nb = (W + 127) // 128
    pad = nb * 128 - W
    if pad:
        img = jnp.pad(img, ((0, 0), (0, pad)))
    blocks = img.reshape(H, nb, 128)

    x0 = corners[:, 0]
    y0 = corners[:, 1]
    if nb >= 2:
        b = jnp.clip(x0 // 128, 0, nb - 2)
        flat = blocks.reshape(H * nb, 128)
        rows = y0[:, None] + jnp.arange(S)[None, :]  # (N, S)
        idx = rows[:, :, None] * nb + (b[:, None, None] + jnp.arange(2))
        g = flat[idx]  # (N, S, 2, 128) — the one gather
        wide = g.reshape(-1, S, 256)
        width = 256
        ox = x0 - b * 128  # offset of the patch start inside `wide`
    else:
        rows = y0[:, None] + jnp.arange(S)[None, :]
        wide = img[rows]  # (N, S, W<=128)
        width = wide.shape[-1]
        ox = x0

    # column compaction: wide (N, S, width) @ sel (N, width, S)
    cols = jnp.arange(width)
    sel = (
        cols[None, :, None] == (ox[:, None, None] + jnp.arange(S)[None, None, :])
    ).astype(img.dtype)
    return jnp.einsum("nrw,nws->nrs", wide, sel), ox


def _lin_sample_mats(d: jax.Array, k: int, S: int, half: int, dtype):
    """Triangular two-tap bilinear row/col selection matrices.

    d: (N,) subpixel window-center coordinate in patch units. Returns
    (N, k, S) with row i sampling patch coordinate d + i - half."""
    tgt = d[:, None] + (jnp.arange(k, dtype=dtype) - half)[None, :]  # (N, k)
    src = jnp.arange(S, dtype=dtype)
    w = 1.0 - jnp.abs(tgt[:, :, None] - src[None, None, :])
    return jnp.maximum(w, 0.0)


def _scharr_patch(P: jax.Array, dtype):
    """Scharr x/y gradients inside the (N, S, S) patch (same-size, edge
    rows/cols invalid — the sampling margin keeps the window interior)."""
    smooth = jnp.array([3.0, 10.0, 3.0], dtype) / 16.0

    def d_axis(P, axis):
        upper = jnp.roll(P, -1, axis)
        lower = jnp.roll(P, 1, axis)
        return (upper - lower) * 0.5

    def s_axis(P, axis):
        return (
            jnp.roll(P, 1, axis) * smooth[0]
            + P * smooth[1]
            + jnp.roll(P, -1, axis) * smooth[2]
        )

    gx = s_axis(d_axis(P, 2), 1)
    gy = s_axis(d_axis(P, 1), 2)
    return gx, gy


def _track_level(
    prev_img, next_img, prev_pts, guess_pts, valid,
    half: int, iters: int, min_eig_thresh: float = 1e-4, S: int = 32,
):
    """One pyramid level of patch-resident iterative LK."""
    H, W = prev_img.shape
    k = 2 * half + 1
    dtype = prev_img.dtype
    N = prev_pts.shape[0]
    hS = S // 2
    margin = hS - half - 2  # iterate drift allowance inside the patch
    assert margin >= 2, f"window half={half} too large for patch S={S}"

    def corners_of(centers):
        c = jnp.round(centers).astype(jnp.int32) - hS
        cx = jnp.clip(c[:, 0], 0, max(W - S, 0))
        cy = jnp.clip(c[:, 1], 0, max(H - S, 0))
        return jnp.stack([cx, cy], -1)

    # ---- template side (one gather + in-patch grads + one sampling) ----
    pc = corners_of(prev_pts)
    P_prev, _ = _row_block_patches(prev_img, pc, S)
    gx_p, gy_p = _scharr_patch(P_prev, dtype)
    dp = prev_pts - pc.astype(dtype)  # (N, 2) window center in patch coords
    Sy0 = _lin_sample_mats(dp[:, 1], k, S, half, dtype)
    Sx0 = _lin_sample_mats(dp[:, 0], k, S, half, dtype)

    def sample(P, Sy, Sx):
        return jnp.einsum("nis,nst,njt->nij", Sy, P, Sx)

    T = sample(P_prev, Sy0, Sx0)
    Gx = sample(gx_p, Sy0, Sx0)
    Gy = sample(gy_p, Sy0, Sx0)

    a11 = jnp.sum(Gx * Gx, axis=(1, 2))
    a12 = jnp.sum(Gx * Gy, axis=(1, 2))
    a22 = jnp.sum(Gy * Gy, axis=(1, 2))
    det = a11 * a22 - a12 * a12
    tr = a11 + a22
    min_eig = (tr - jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0))) / (2.0 * k * k)
    ok0 = valid & (min_eig > min_eig_thresh)
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-12, det, jnp.inf)

    # ---- search side (one gather; iterations never touch the image) ----
    nc = corners_of(guess_pts)
    P_next, _ = _row_block_patches(next_img, nc, S)
    nc_f = nc.astype(dtype)

    def cond(carry):
        # cv::TermCriteria(COUNT | EPS, iters, 0.01): stop when every live
        # point's last step fell under eps — the typical frame converges in
        # ~5-10 iterations, and the fixed-30 scan was pure latency-bound
        # waste on TPU (120 sequential level-iterations per frame)
        _, it, max_step = carry
        return (it < iters) & (max_step > 0.01)

    def body(carry):
        pts, it, _ = carry
        d = pts - nc_f  # window center in patch coords
        Sy = _lin_sample_mats(d[:, 1], k, S, half, dtype)
        Sx = _lin_sample_mats(d[:, 0], k, S, half, dtype)
        J = sample(P_next, Sy, Sx)
        dI = J - T
        b1 = jnp.sum(dI * Gx, axis=(1, 2))
        b2 = jnp.sum(dI * Gy, axis=(1, 2))
        dx = -(a22 * b1 - a12 * b2) * inv_det
        dy = -(-a12 * b1 + a11 * b2) * inv_det
        step = jnp.stack([dx, dy], axis=-1)
        step = jnp.where(ok0[:, None], step, 0.0)
        # keep the iterate inside the sampled patch
        lo = nc_f + (hS - margin)
        hi = nc_f + (hS + margin)
        new_pts = jnp.clip(pts + step, lo, hi)
        max_step = jnp.max(jnp.abs(new_pts - pts))
        return new_pts, it + 1, max_step

    pts, _, _ = jax.lax.while_loop(
        cond, body, (guess_pts, jnp.int32(0), jnp.asarray(jnp.inf, dtype))
    )

    inb = (
        (pts[:, 0] > half) & (pts[:, 0] < W - 1 - half)
        & (pts[:, 1] > half) & (pts[:, 1] < H - 1 - half)
    )
    # converged iterates sit strictly inside the drift margin; ones pinned
    # to the clamp boundary ran out of patch (would need a re-gather)
    d_final = pts - nc_f - hS
    in_patch = jnp.max(jnp.abs(d_final), axis=1) < (margin - 1e-3)

    d = pts - nc_f
    Sy = _lin_sample_mats(d[:, 1], k, S, half, dtype)
    Sx = _lin_sample_mats(d[:, 0], k, S, half, dtype)
    J = sample(P_next, Sy, Sx)
    err = jnp.mean(jnp.abs(J - T), axis=(1, 2))
    return pts, ok0 & inb & in_patch, err


@partial(jax.jit, static_argnames=("levels", "half", "iters", "patch"))
def track(
    prev_img: jax.Array | None,  # (H, W) float; None iff prev_pyr given
    next_img: jax.Array,
    prev_pts: jax.Array,  # (N, 2) level-0 pixel coords
    valid: jax.Array,  # (N,)
    levels: int = 3,
    half: int = 10,  # 21x21 window
    iters: int = 30,
    patch: int = 32,  # S: per-level sampled neighborhood; margin = S/2-half-2
    prev_pyr: tuple | None = None,  # precomputed pyramids (the tracker
    next_pyr: tuple | None = None,  # caches the prev frame's across steps)
) -> KLTResult:
    """Pyramidal LK: coarse-to-fine over `levels`+1 images.

    `patch` bounds the per-level trackable displacement (margin =
    patch/2 - half - 2 px at the COARSEST level; larger inter-frame motion
    needs a bigger patch or more levels)."""
    if prev_pyr is None:
        prev_pyr = imops.build_pyramid(prev_img, levels)
    if next_pyr is None:
        next_pyr = imops.build_pyramid(next_img, levels)

    scale = 2.0**levels
    pts = prev_pts / scale
    status = valid
    err = jnp.zeros(prev_pts.shape[0], next_img.dtype)
    for lvl in range(levels, -1, -1):
        s = 2.0**lvl
        p_lvl = prev_pts / s
        pts, ok, err = _track_level(
            prev_pyr[lvl], next_pyr[lvl], p_lvl, pts, status, half, iters,
            S=patch,
        )
        status = ok
        if lvl > 0:
            pts = pts * 2.0
    return KLTResult(pts=pts, status=status, err=err)
