"""Lidar depth association for visual features.

TPU re-design of `DepthRegister::get_depth`
(`feature_tracker/src/feature_tracker.h:116-331`):

1. depth cloud (camera-body ROS frame: x fwd, y left, z up) is scattered
   into a num_bins x num_bins polar range image (0.5 deg bins over the
   front hemisphere), keeping the nearest point per bin (`:169-207`);
2. features lift to the unit sphere in the same frame (`:153-167`);
3. 3-NN on the unit sphere among surviving bin points (`:225-236`) — the
   reference's kd-tree gates matches at sin(bin_res)*5, which is < 6 bins,
   so an exact windowed search over the +-6-bin neighborhood reproduces
   `nearestKSearch` exactly;
4. the feature ray is intersected with the plane through the 3 neighbors;
   rejected if neighbor depth spread > 2 m or s <= 0.5, clamped into the
   neighbor depth range (`:241-279`);
5. only depths > 3 m are reported (`:285-289`); -1 = no depth.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_FLT_MAX = jnp.float32(3.4e38)


@partial(jax.jit, static_argnames=("num_bins", "window"))
def feature_depths(
    features_norm: jax.Array,  # (F, 2) undistorted normalized-plane (x, y)
    features_valid: jax.Array,  # (F,)
    cloud_xyz: jax.Array,  # (P, 3) depth cloud in camera-BODY frame (x fwd)
    cloud_valid: jax.Array,  # (P,)
    num_bins: int = 360,
    window: int = 6,  # +-bins of exact NN search (covers the kd gate)
):
    """Returns (F,) depths in the z-forward camera convention; -1 = none."""
    P = cloud_xyz.shape[0]
    F = features_norm.shape[0]
    bin_res = 180.0 / num_bins

    # --- range-image scatter (nearest point per polar bin) ---
    x, y, z = cloud_xyz[:, 0], cloud_xyz[:, 1], cloud_xyz[:, 2]
    ok = cloud_valid & (x > 0) & (jnp.abs(y / jnp.maximum(x, 1e-9)) <= 10) & (
        jnp.abs(z / jnp.maximum(x, 1e-9)) <= 10
    )
    row_angle = jnp.arctan2(z, jnp.sqrt(x * x + y * y)) * (180.0 / jnp.pi) + 90.0
    col_angle = jnp.arctan2(x, y) * (180.0 / jnp.pi)
    row = jnp.round(row_angle / bin_res).astype(jnp.int32)
    col = jnp.round(col_angle / bin_res).astype(jnp.int32)
    ok &= (row >= 0) & (row < num_bins) & (col >= 0) & (col < num_bins)
    rng = jnp.linalg.norm(cloud_xyz, axis=-1)
    flat = jnp.where(ok, row * num_bins + col, num_bins * num_bins)

    # nearest-per-bin via two scatter-mins (exact, lowest-index tie-break) —
    # a P-sized argsort is pure waste on TPU (NOTES.md): min the range per
    # bin, then min the point index among range-achieving points
    rngw = jnp.where(ok, rng, _FLT_MAX)
    binmin = jnp.full(num_bins * num_bins + 1, _FLT_MAX).at[flat].min(rngw)
    is_min = ok & (rngw <= binmin[flat])
    idxw = jnp.where(is_min, jnp.arange(P, dtype=jnp.int32), P)
    win = jnp.full(num_bins * num_bins + 1, P, jnp.int32).at[flat].min(idxw)
    win = win[:-1]
    bin_occupied = win < P
    widx = jnp.where(bin_occupied, win, 0)
    bin_xyz = jnp.where(bin_occupied[:, None], cloud_xyz[widx], 0.0)
    bin_rng = jnp.where(bin_occupied, rng[widx], _FLT_MAX)
    bin_unit = bin_xyz / jnp.maximum(bin_rng, 1e-9)[:, None]

    n_pts = jnp.sum(bin_occupied)

    # --- features to unit sphere in body frame: (z, -x, -y)/norm ---
    f3 = jnp.stack(
        [jnp.ones(F, features_norm.dtype), features_norm[:, 0], features_norm[:, 1]],
        axis=-1,
    )  # camera (x_n, y_n, 1) -> reorder below
    v = jnp.stack([f3[:, 0], -f3[:, 1], -f3[:, 2]], axis=-1)  # body frame ray
    v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)

    f_row_angle = jnp.arctan2(v[:, 2], jnp.sqrt(v[:, 0] ** 2 + v[:, 1] ** 2)) * (
        180.0 / jnp.pi
    ) + 90.0
    f_col_angle = jnp.arctan2(v[:, 0], v[:, 1]) * (180.0 / jnp.pi)
    f_row = jnp.round(f_row_angle / bin_res).astype(jnp.int32)
    f_col = jnp.round(f_col_angle / bin_res).astype(jnp.int32)

    # --- windowed exact 3-NN on the sphere ---
    W = 2 * window + 1
    dr = jnp.arange(-window, window + 1)
    rr = jnp.clip(f_row[:, None, None] + dr[None, :, None], 0, num_bins - 1)
    cc = jnp.clip(f_col[:, None, None] + dr[None, None, :], 0, num_bins - 1)
    cand = (rr * num_bins + cc).reshape(F, W * W)
    cand_unit = bin_unit[cand]  # (F, W*W, 3)
    cand_occ = bin_occupied[cand]
    d2 = jnp.sum((cand_unit - v[:, None, :]) ** 2, axis=-1)
    d2 = jnp.where(cand_occ, d2, _FLT_MAX)
    nd2, sel = jax.lax.top_k(-d2, 3)
    nd2 = -nd2
    nn = jnp.take_along_axis(cand, sel, axis=1)  # (F, 3) bin ids

    dist_sq_threshold = (jnp.sin(bin_res * jnp.pi / 180.0) * 5.0) ** 2
    have3 = (nd2[:, 2] < dist_sq_threshold) & (n_pts >= 10) & features_valid

    r123 = bin_rng[nn]  # (F, 3)
    ABC = bin_unit[nn] * r123[..., None]  # (F, 3, 3) cartesian neighbors
    A, B, C = ABC[:, 0], ABC[:, 1], ABC[:, 2]
    N = jnp.cross(A - B, B - C)
    denom = jnp.einsum("fj,fj->f", N, v)
    s = jnp.einsum("fj,fj->f", N, A) / jnp.where(jnp.abs(denom) > 1e-9, denom, jnp.inf)

    min_d = jnp.min(r123, axis=1)
    max_d = jnp.max(r123, axis=1)
    good = have3 & (max_d - min_d <= 2.0) & (s > 0.5)
    s = jnp.clip(s, min_d, max_d)

    # depth for the z-forward camera: body x component of the scaled ray
    depth = v[:, 0] * s
    depth = jnp.where(good & (depth > 3.0), depth, -1.0)
    return depth
