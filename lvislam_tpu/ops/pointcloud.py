"""Point-cloud kernels: range-image projection, motion deskew, ring
compaction, voxel-grid downsampling.

TPU re-design of `lidar_odometry/src/imageProjection.cpp` (projection +
deskew, lines 495-647) and the PCL `VoxelGrid` filters used throughout
(`featureExtraction.cpp:60`, `mapOptimization.cpp:145-153`):

- The reference's per-point loops become fully vectorized fixed-shape ops on
  a (N_SCAN, Horizon_SCAN) grid — the range image is already tensor-shaped.
- "First point wins" cell dedup (`imageProjection.cpp:612`) is a scatter-min
  on point index.
- PCL VoxelGrid (centroid of points per voxel) becomes a sort-based
  segment-mean: sort voxel keys, segment boundaries mark unique voxels,
  centroids come from inclusive-scan differences. Deterministic and exact.
- Padding points carry valid=False and are routed to a trash cell.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core import lie


def livox_columns(ring: jax.Array, valid: jax.Array, n_scan: int) -> jax.Array:
    """Livox column index = per-ring arrival counter
    (`imageProjection.cpp:602-606`): the i-th valid point on ring r gets
    column (number of prior valid points on ring r)."""
    # cumsum along the MINOR axis only: a major-axis cumsum with a tiny minor
    # dim takes XLA:TPU ~2 minutes to compile (serial lowering)
    one_hot = (
        jnp.where(valid, ring, n_scan)[None, :]
        == jnp.arange(n_scan)[:, None]
    ).astype(jnp.int32)  # (n_scan, P)
    counts = jnp.cumsum(one_hot, axis=-1) - one_hot  # exclusive prefix per ring
    return jnp.take_along_axis(counts, jnp.clip(ring, 0, n_scan - 1)[None, :], axis=0)[0]


def spherical_columns(xyz: jax.Array, horizon_scan: int) -> jax.Array:
    """Velodyne/Ouster column from azimuth (`imageProjection.cpp:597-603`)."""
    horizon_angle = jnp.arctan2(xyz[:, 0], xyz[:, 1]) * (180.0 / jnp.pi)
    ang_res = 360.0 / horizon_scan
    col = -jnp.round((horizon_angle - 90.0) / ang_res).astype(jnp.int32) + horizon_scan // 2
    return jnp.where(col >= horizon_scan, col - horizon_scan, col)


def project_to_range_image(
    xyz: jax.Array,  # (P, 3)
    intensity: jax.Array,  # (P,)
    ring: jax.Array,  # (P,) int32
    valid: jax.Array,  # (P,) bool
    n_scan: int,
    horizon_scan: int,
    min_range: float,
    max_range: float,
    columns: jax.Array | None = None,
    downsample_rate: int = 1,
):
    """Range-image projection with first-point-wins dedup
    (`imageProjection.cpp:570-622`).

    Returns (range_img (N,H), xyz_img (N,H,3), intensity_img (N,H),
    valid_img (N,H)). Cells with no point have range=inf.
    """
    P = xyz.shape[0]
    rng = jnp.linalg.norm(xyz, axis=-1)
    ok = valid & (rng >= min_range) & (rng <= max_range)
    ok &= (ring >= 0) & (ring < n_scan)
    if downsample_rate > 1:
        ok &= (ring % downsample_rate) == 0
    if columns is None:
        columns = livox_columns(ring, ok, n_scan)
    ok &= (columns >= 0) & (columns < horizon_scan)

    # route invalid points to a trash cell
    flat = jnp.where(ok, ring * horizon_scan + columns, n_scan * horizon_scan)
    # first-wins: scatter-min of point index per cell
    winner = jnp.full(n_scan * horizon_scan + 1, P, jnp.int32)
    winner = winner.at[flat].min(jnp.arange(P, dtype=jnp.int32))
    winner = winner[:-1]
    cell_valid = winner < P
    widx = jnp.where(cell_valid, winner, 0)
    range_img = jnp.where(cell_valid, rng[widx], jnp.inf).reshape(n_scan, horizon_scan)
    xyz_img = jnp.where(cell_valid[:, None], xyz[widx], 0.0).reshape(n_scan, horizon_scan, 3)
    inten_img = jnp.where(cell_valid, intensity[widx], 0.0).reshape(n_scan, horizon_scan)
    time_idx_img = jnp.where(cell_valid, widx, -1).reshape(n_scan, horizon_scan)
    return range_img, xyz_img, inten_img, cell_valid.reshape(n_scan, horizon_scan), time_idx_img


def deskew_points(
    xyz: jax.Array,  # (P, 3)
    rel_time: jax.Array,  # (P,) seconds from scan start
    imu_time: jax.Array,  # (M,) sample times relative to scan start (sorted)
    imu_quat: jax.Array,  # (M, 4) cumulative gyro rotation table (start -> t)
    imu_valid_count: jax.Array,  # () int32 number of valid table entries
    ref_time: jax.Array,  # () rotation reference: time of the first projected point
) -> jax.Array:
    """Rotational deskew (`imageProjection.cpp:495-581`): each point is
    rotated by R(ref)⁻¹ R(t_point), where R interpolates the gyro-integrated
    attitude table. Positional deskew is disabled in the reference
    (`findPosition`, `:522-536`) and omitted here too.

    The reference integrates gyro angles per-axis and composes Euler RPY; we
    keep a proper quaternion table (`preintegration.gyro_rotation_table`) —
    equivalent to first order for intra-scan rotations.
    """

    # vectorized table interpolation: pad invalid entries to +inf so a single
    # searchsorted covers all points at once (no per-point vmap — this keeps
    # the XLA graph small and the lookup one fused gather)
    M = imu_time.shape[0]
    t_sorted = jnp.where(jnp.arange(M) < imu_valid_count, imu_time, jnp.inf)

    def interp(t):
        idx = jnp.searchsorted(t_sorted, t, side="right") - 1
        idx = jnp.clip(idx, 0, imu_valid_count - 1)
        nxt = jnp.clip(idx + 1, 0, imu_valid_count - 1)
        t0 = t_sorted[idx]
        t1 = jnp.where(jnp.isfinite(t_sorted[nxt]), t_sorted[nxt], t0)
        ratio = jnp.where(t1 > t0, (t - t0) / jnp.maximum(t1 - t0, 1e-12), 0.0)
        ratio = jnp.clip(ratio, 0.0, 1.0)
        return lie.quat_slerp(imu_quat[idx], imu_quat[nxt], ratio[..., None])

    q_pts = interp(rel_time)  # (P, 4)
    q_ref = interp(ref_time)
    q_corr = lie.quat_multiply(
        jnp.broadcast_to(lie.quat_conjugate(q_ref), q_pts.shape), q_pts
    )
    return lie.quat_rotate(q_corr, xyz)


def compact_rings(valid_img: jax.Array, horizon_scan: int):
    """Ring-major compaction order (`cloudExtraction`,
    `imageProjection.cpp:624-647`): per ring, valid cells packed left
    preserving column order. Returns (order (N,H) gather indices into each
    ring, counts (N,), start_idx (N,), end_idx (N,)) where start/end carry
    the reference's ±5 margins and index into the *flat* compacted array.

    `order[r, j]` for j >= counts[r] is 0 — callers mask by counts. The
    compaction is a prefix-sum + scatter rather than a stable argsort of
    binary keys: identical for the in-count entries and far cheaper on TPU
    (no 6000-wide sort per ring).
    """
    n_scan = valid_img.shape[0]
    # cumsum along the minor (lane) axis — the fast direction on TPU
    incl = jnp.cumsum(valid_img.astype(jnp.int32), axis=1)
    counts = incl[:, -1]
    dest = jnp.where(valid_img, incl - 1, horizon_scan)  # invalid -> trash
    col = jnp.broadcast_to(
        jnp.arange(horizon_scan, dtype=jnp.int32)[None, :], valid_img.shape
    )
    order = jnp.zeros((n_scan, horizon_scan + 1), jnp.int32)
    order = order.at[jnp.arange(n_scan)[:, None], dest].set(col)
    order = order[:, :horizon_scan]
    cum = jnp.concatenate([jnp.zeros(1, counts.dtype), jnp.cumsum(counts)])
    start_idx = cum[:-1] - 1 + 5
    end_idx = cum[1:] - 1 - 5
    return order, counts, start_idx, end_idx


def project_compact(
    xyz: jax.Array,  # (P, 3) (deskewed) points
    intensity: jax.Array,  # (P,)
    ring: jax.Array,  # (P,) int32
    valid: jax.Array,  # (P,) bool
    n_scan: int,
    horizon_scan: int,
    min_range: float,
    max_range: float,
    columns: jax.Array | None = None,
    downsample_rate: int = 1,
):
    """Fused `project_to_range_image` + `compact_rings` + gathers: the
    range-image dedup (first-point-wins scatter-min) composes directly with
    the ring compaction, so the (N, H, ·) intermediate images are never
    materialized — one point gather replaces the seven of the unfused path.

    Returns (flat_xyz (N*H,3), flat_int (N*H,), flat_rng (N*H,),
    flat_col (N*H,) int32, flat_valid (N*H,), counts (N,),
    start_idx (N,), end_idx (N,)). Entries past counts are masked junk.
    """
    P = xyz.shape[0]
    rng = jnp.linalg.norm(xyz, axis=-1)
    ok = valid & (rng >= min_range) & (rng <= max_range)
    ok &= (ring >= 0) & (ring < n_scan)
    if downsample_rate > 1:
        ok &= (ring % downsample_rate) == 0
    unique_cols = columns is None
    if columns is None:
        columns = livox_columns(ring, ok, n_scan)
    ok &= (columns >= 0) & (columns < horizon_scan)

    if unique_cols:
        # Livox counter columns are UNIQUE per ring by construction (the
        # i-th surviving point of ring r gets column i), so the first-wins
        # dedup is the identity and the per-ring left-compaction is too
        # (valid cells are exactly the prefix 0..count-1). One unique-index
        # scatter replaces the scatter-min + the compaction scatter —
        # each costs ~1 ms at 24k points on TPU (scatters serialize).
        flat_cell = jnp.where(
            ok, ring * horizon_scan + columns, n_scan * horizon_scan
        )
        winner = jnp.full(n_scan * horizon_scan + 1, P, jnp.int32)
        winner = winner.at[flat_cell].set(jnp.arange(P, dtype=jnp.int32))
        winner = winner[:-1].reshape(n_scan, horizon_scan)
        counts = jnp.sum(
            ok[None, :] & (ring[None, :] == jnp.arange(n_scan)[:, None]),
            axis=-1,
        ).astype(jnp.int32)
        # junk slots (past each ring's count) carry column 0, matching the
        # general path — the occlusion mask reads neighbor columns at ring
        # tails, so the junk value is behavior-relevant
        hh = jnp.arange(horizon_scan, dtype=jnp.int32)[None, :]
        order = jnp.where(hh < counts[:, None], hh, 0)
        cum = jnp.concatenate([jnp.zeros(1, counts.dtype), jnp.cumsum(counts)])
        start_idx = (cum[:-1] - 1 + 5).astype(jnp.int32)
        end_idx = (cum[1:] - 1 - 5).astype(jnp.int32)
        gidx = jnp.clip(winner.reshape(-1), 0, P - 1)
    else:
        # general path (spherical columns collide): first-wins dedup via
        # scatter-min of point index per cell (trash cell last)
        flat_cell = jnp.where(
            ok, ring * horizon_scan + columns, n_scan * horizon_scan
        )
        winner = jnp.full(n_scan * horizon_scan + 1, P, jnp.int32)
        winner = winner.at[flat_cell].min(jnp.arange(P, dtype=jnp.int32))
        winner = winner[:-1].reshape(n_scan, horizon_scan)
        valid_img = winner < P

        order, counts, start_idx, end_idx = compact_rings(valid_img, horizon_scan)
        gidx = jnp.take_along_axis(winner, order, axis=1).reshape(-1)
        gidx = jnp.clip(gidx, 0, P - 1)
    flat_valid = (
        jnp.arange(horizon_scan, dtype=counts.dtype)[None, :] < counts[:, None]
    ).reshape(-1)
    data = jnp.concatenate([xyz, rng[:, None], intensity[:, None]], axis=-1)
    flat = data[gidx]
    flat_rng = jnp.where(flat_valid, flat[:, 3], 0.0)
    return (
        flat[:, 0:3], flat[:, 4], flat_rng, order.reshape(-1),
        flat_valid, counts, start_idx, end_idx,
    )


def gather_compacted(order, counts, img):
    """Apply compaction order to a (N, H, ...) image and flatten to (N*H, ...)
    with validity mask."""
    n_scan, h = order.shape
    flat = jnp.take_along_axis(
        img.reshape(n_scan, h, -1), order[..., None], axis=1
    )
    pos = jnp.arange(h)[None, :]
    valid = pos < counts[:, None]
    out = flat.reshape(n_scan * h, -1)
    if img.ndim == 2:
        out = out[:, 0]
    return out, valid.reshape(-1)


def _voxel_keys(xyz: jax.Array, valid: jax.Array, leaf: float):
    """Quantized voxel coordinates packed into one int32 key; invalid points
    get the sentinel key 2^31-1 (sorts last)."""
    c = jnp.floor(xyz / leaf).astype(jnp.int32) + (1 << 9)
    c = jnp.clip(c, 0, (1 << 10) - 1)
    key = (c[:, 0] << 20) | (c[:, 1] << 10) | c[:, 2]
    return jnp.where(valid, key, jnp.int32(2**31 - 1))


def voxel_downsample(
    xyz: jax.Array,  # (P, 3)
    valid: jax.Array,  # (P,)
    leaf: float,
    capacity: int,
    intensity: jax.Array | None = None,
    center: jax.Array | None = None,
):
    """PCL VoxelGrid equivalent: centroid of the points in each occupied
    voxel. Sort-based segment mean — exact, deterministic, fixed-shape.

    Returns (xyz_out (capacity,3), valid_out (capacity,), intensity_out).
    Voxels beyond `capacity` are dropped — by voxel key order, or, when
    `center` (3,) is given, FARTHEST-from-center first (lexsort on the
    quantized voxel-center distance): the capacity-overflow behavior the
    loop-closure submap needs, where the PCL original is unbounded
    (`performLoopClosure` 0.4 m leaf, `mapOptimization.cpp:549-628`) and a
    key-ordered drop would keep a spatially biased slab of the map.

    Small inputs (P <= 4096) dispatch to the sort-free dense path — a TPU
    argsort costs ~0.5 ms even at P=2048, while the (P, P) key-equality
    matmul is tens of microseconds. Same centroids; output ordered by first
    occurrence instead of key order (consumers treat the result as a set).
    """
    if center is None and xyz.shape[0] <= 4096:
        return _voxel_downsample_dense(xyz, valid, leaf, capacity, intensity)
    keys = _voxel_keys(xyz, valid, leaf)
    if center is not None:
        # distance of each point's VOXEL CENTER to `center`, in leaf units —
        # identical for every point of a voxel, so segments stay contiguous
        c = jnp.floor(xyz / leaf) + 0.5
        d = jnp.linalg.norm(c * leaf - center[None, :], axis=-1)
        dq = jnp.where(valid, (d / leaf).astype(jnp.int32),
                       jnp.int32(2**31 - 1))
        order = jnp.lexsort((keys, dq))  # primary: distance; ties: key
    else:
        order = jnp.argsort(keys)
    ks = keys[order]
    xs = xyz[order]
    vs = valid[order]
    ins = intensity[order] if intensity is not None else jnp.zeros(xyz.shape[0], xyz.dtype)

    is_first = jnp.concatenate([jnp.ones(1, bool), ks[1:] != ks[:-1]]) & vs
    seg_id = jnp.cumsum(is_first) - 1  # segment index per point (valid region)

    n_seg = capacity
    sid = jnp.where(vs & (seg_id < n_seg), seg_id, n_seg)  # overflow → trash slot
    sums = jnp.zeros((n_seg + 1, 4), xyz.dtype)
    data = jnp.concatenate([xs, ins[:, None]], axis=-1)
    sums = sums.at[sid].add(data)
    cnts = jnp.zeros(n_seg + 1, jnp.int32).at[sid].add(1)
    # segments that overflowed capacity were all lumped into slot n_seg-1;
    # detect: number of segments = max seg_id + 1
    total_seg = jnp.sum(is_first)
    out_valid = jnp.arange(n_seg) < jnp.minimum(total_seg, n_seg)
    denom = jnp.maximum(cnts[:n_seg], 1).astype(xyz.dtype)[:, None]
    cent = sums[:n_seg] / denom
    out_xyz = jnp.where(out_valid[:, None], cent[:, :3], 0.0)
    out_int = jnp.where(out_valid, cent[:, 3], 0.0)
    return out_xyz, out_valid, out_int


def _voxel_downsample_dense(
    xyz: jax.Array,  # (P, 3), P small
    valid: jax.Array,  # (P,)
    leaf: float,
    capacity: int,
    intensity: jax.Array | None = None,
):
    """Sort-free voxel centroid downsample for small clouds: pairwise
    key equality (P, P) + one MXU matmul for the segment sums, then a
    prefix-sum scatter compaction of the first-occurrence rows. On
    capacity overflow, later-seen voxels are dropped (the sort path drops
    highest keys — callers size capacities so neither triggers)."""
    P = xyz.shape[0]
    keys = _voxel_keys(xyz, valid, leaf)
    eq = (keys[:, None] == keys[None, :]) & valid[None, :] & valid[:, None]
    idx = jnp.arange(P, dtype=jnp.int32)
    earlier = idx[None, :] < idx[:, None]
    first = valid & ~jnp.any(eq & earlier, axis=1)

    ins = intensity if intensity is not None else jnp.zeros(P, xyz.dtype)
    data = jnp.concatenate([xyz, ins[:, None]], axis=-1)  # (P, 4)
    sums = eq.astype(xyz.dtype) @ data
    cnts = jnp.sum(eq, axis=1)
    cent = sums / jnp.maximum(cnts, 1).astype(xyz.dtype)[:, None]

    f32 = first.astype(jnp.int32)
    rank = jnp.cumsum(f32) - f32  # exclusive rank among first rows
    slot = jnp.where(first & (rank < capacity), rank, capacity)
    out = jnp.zeros((capacity + 1, 4), xyz.dtype).at[slot].set(cent)
    n_vox = jnp.sum(f32)
    out_valid = jnp.arange(capacity) < jnp.minimum(n_vox, capacity)
    out_xyz = jnp.where(out_valid[:, None], out[:capacity, :3], 0.0)
    out_int = jnp.where(out_valid, out[:capacity, 3], 0.0)
    return out_xyz, out_valid, out_int


def remove_ego_points(xyz: jax.Array, valid: jax.Array, min_range: float) -> jax.Array:
    """Drop points closer than min_range (ego returns)."""
    return valid & (jnp.linalg.norm(xyz, axis=-1) >= min_range)


@partial(jax.jit, static_argnames=("capacity",))
def transform_cloud(t: jax.Array, q: jax.Array, xyz: jax.Array, capacity: int = 0):
    """Rigid transform of a padded cloud (`mapOptimization.cpp:356-365`
    transformPointCloud, OpenMP loop → one fused op)."""
    return lie.quat_rotate(q[None, :], xyz) + t[None, :]
