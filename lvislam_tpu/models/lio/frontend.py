"""LIS front-end stages: scan projection/deskew and LOAM feature extraction.

These are the TPU equivalents of the reference's `imageProjection` node
(`lidar_odometry/src/imageProjection.cpp:52-655`) and `featureExtraction`
node (`featureExtraction.cpp:72-264`) — but instead of two processes joined
by DDS, they are two jitted pure functions over fixed-shape pytrees,
composed by the replay scheduler.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...core import lie
from ...ops import loam, pointcloud as pc
from ...ops.preintegration import gyro_rotation_table


class ProjectionResult(NamedTuple):
    """CloudInfo equivalent for the deskew stage (`msg/CloudInfo.msg`)."""

    xyz: jax.Array  # (P, 3) deskewed, compacted ring-major
    intensity: jax.Array  # (P,)
    valid: jax.Array  # (P,)
    point_col: jax.Array  # (P,) int32
    point_range: jax.Array  # (P,)
    start_ring_index: jax.Array  # (R,)
    end_ring_index: jax.Array  # (R,)
    imu_available: jax.Array  # () bool
    imu_rpy_init: jax.Array  # (3,) roll/pitch/yaw rad at scan start
    num_valid: jax.Array  # () int32


@partial(jax.jit, static_argnames=("n_scan", "horizon", "downsample_rate"))
def project_scan(
    xyz: jax.Array,  # (P, 3) raw points, sensor frame at measurement time
    intensity: jax.Array,  # (P,)
    ring: jax.Array,  # (P,) int32
    rel_time: jax.Array,  # (P,) seconds from scan start
    point_valid: jax.Array,  # (P,)
    imu_rel_time: jax.Array,  # (M,) IMU stamps relative to scan start (sorted)
    imu_gyro: jax.Array,  # (M, 3)
    imu_count: jax.Array,  # () int32 valid IMU samples
    imu_rpy_init: jax.Array,  # (3,) attitude at scan start (from IMU orientation)
    imu_available: jax.Array,  # () bool
    n_scan: int,
    horizon: int,
    min_range: float = 1.0,
    max_range: float = 100.0,
    downsample_rate: int = 1,
) -> ProjectionResult:
    """Deskew + range-image projection + ring compaction
    (`imageProjection.cpp:222-237` pipeline)."""
    # gyro-only attitude table over the scan (`imuDeskewInfo`, :354-410)
    dts = jnp.diff(imu_rel_time, prepend=imu_rel_time[0:1])
    dts = jnp.where(jnp.arange(dts.shape[0]) < imu_count, dts, 0.0)
    quat_table = gyro_rotation_table(dts, imu_gyro)[1:]  # (M, 4) at sample times

    # rotation reference = first valid point (reference firstPointFlag, :553)
    first_idx = jnp.argmax(point_valid)
    ref_time = rel_time[first_idx]

    do_deskew = imu_available & (imu_count > 1)
    deskewed = pc.deskew_points(
        xyz, rel_time, imu_rel_time, quat_table, imu_count, ref_time
    )
    xyz_d = jnp.where(do_deskew, deskewed, xyz)

    (flat_xyz, flat_int, flat_rng, flat_col, flat_valid,
     _counts, start_idx, end_idx) = pc.project_compact(
        xyz_d, intensity, ring, point_valid, n_scan, horizon,
        min_range, max_range, columns=None, downsample_rate=downsample_rate,
    )

    return ProjectionResult(
        xyz=flat_xyz,
        intensity=flat_int,
        valid=flat_valid,
        point_col=flat_col,
        point_range=flat_rng,
        start_ring_index=start_idx.astype(jnp.int32),
        end_ring_index=end_idx.astype(jnp.int32),
        imu_available=imu_available,
        imu_rpy_init=imu_rpy_init,
        num_valid=jnp.sum(flat_valid).astype(jnp.int32),
    )


class FeatureResult(NamedTuple):
    corner_xyz: jax.Array  # (C, 3)
    corner_valid: jax.Array  # (C,)
    surf_xyz: jax.Array  # (S, 3)
    surf_valid: jax.Array  # (S,)
    num_corner: jax.Array  # ()
    num_surf: jax.Array  # ()


@partial(jax.jit, static_argnames=("max_corner", "max_surf", "exact_selection"))
def extract_features(
    proj: ProjectionResult,
    edge_threshold: float = 1.0,
    surf_threshold: float = 0.1,
    surf_leaf: float = 0.4,
    max_corner: int = 1024,
    max_surf: int = 8192,
    exact_selection: bool = False,
) -> FeatureResult:
    """LOAM feature selection (`featureExtraction.cpp:87-245`).

    `exact_selection=True` reproduces the reference's sequential greedy pick
    bit-for-bit (240 device-loop iterations); the default fused window-NMS
    variant picks a near-identical set in one vectorized pass (~50x faster).
    """
    curv = loam.curvature(proj.point_range, proj.valid)
    occl = loam.occlusion_mask(proj.point_range, proj.point_col, proj.valid)
    select = loam.select_edges if exact_selection else loam.select_edges_fast
    edges = select(
        curv, proj.point_col, occl, proj.valid,
        proj.start_ring_index, proj.end_ring_index, edge_threshold,
    )
    # compact edge points to capacity (order-preserving): prefix-sum +
    # scatter instead of a full-P stable argsort of a binary key
    e32 = edges.astype(jnp.int32)
    n_edges = jnp.sum(e32)
    dest = jnp.cumsum(e32) - e32  # exclusive rank among edges
    slot = jnp.where(edges, jnp.minimum(dest, max_corner), max_corner)
    eidx = (
        jnp.zeros(max_corner + 1, jnp.int32)
        .at[slot].set(jnp.arange(edges.shape[0], dtype=jnp.int32))[:max_corner]
    )
    corner_xyz = proj.xyz[eidx]
    corner_valid = jnp.arange(max_corner) < n_edges

    surf_mask = loam.surface_candidates(edges, proj.valid)
    surf_xyz, surf_valid, _ = pc.voxel_downsample(
        proj.xyz, surf_mask, surf_leaf, max_surf, proj.intensity
    )
    return FeatureResult(
        corner_xyz=corner_xyz,
        corner_valid=corner_valid,
        surf_xyz=surf_xyz,
        surf_valid=surf_valid,
        num_corner=jnp.sum(edges).astype(jnp.int32),
        num_surf=jnp.sum(surf_valid).astype(jnp.int32),
    )
