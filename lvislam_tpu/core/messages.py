"""Typed message contracts — the in-process replacement for the reference's
ROS 2 DDS topics (SURVEY.md §2.7).

Every inter-stage payload in the reference becomes a frozen pytree dataclass
here, with fixed-shape arrays + validity masks so messages can flow straight
into jitted kernels:

- ``CloudInfo``  ⇔ `lidar_odometry/msg/CloudInfo.msg:1-36` (the LIS contract).
- ``Odometry``   ⇔ nav_msgs/Odometry incl. the covariance side-channel that
  smuggles reset-id / biases / gravity (`imuPreintegration.cpp:527-534`,
  read at `initial_alignment.h:160-180`).
- ``FeatureFrame`` ⇔ the 6-channel sensor_msgs/PointCloud published by
  feature_tracker (`feature_tracker_node.cpp:170-223`).
- ``ImuSample``, ``LidarScan``, ``CameraImage`` ⇔ raw sensor topics.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class ImuSample:
    """One IMU measurement (`sensor_msgs/Imu`): body-frame specific force and
    angular velocity. In batch form the arrays carry a leading time axis."""

    stamp: jax.Array  # () or (T,) float64-as-f32 seconds
    acc: jax.Array  # (..., 3)
    gyro: jax.Array  # (..., 3)
    quat: jax.Array  # (..., 4) orientation wxyz if the driver provides one


@struct.dataclass
class LidarScan:
    """Raw lidar scan, Livox CustomMsg flavored (`imageProjection.cpp:240-260`
    moveFromCustomMsg): per-point position, intensity, ring, time offset."""

    stamp: jax.Array  # scan header stamp (start of scan), seconds
    xyz: jax.Array  # (P, 3)
    intensity: jax.Array  # (P,)
    ring: jax.Array  # (P,) int32
    time: jax.Array  # (P,) seconds relative to stamp
    valid: jax.Array  # (P,) bool padding mask


@struct.dataclass
class CloudInfo:
    """Inter-stage LIS contract ⇔ `msg/CloudInfo.msg:1-36`.

    Fixed-shape variant: the deskewed cloud keeps the raw capacity with masks;
    ring start/end indices are kept for the feature extractor's sector logic.
    """

    stamp: jax.Array

    start_ring_index: jax.Array  # (N_SCAN,) int32
    end_ring_index: jax.Array  # (N_SCAN,) int32
    point_col_ind: jax.Array  # (P,) int32 column of each extracted point
    point_range: jax.Array  # (P,) float range of each extracted point

    imu_available: jax.Array  # () bool
    odom_available: jax.Array  # () bool

    # IMU attitude estimate at scan start (`CloudInfo.msg` imu_roll/pitch/yaw_init)
    imu_rpy_init: jax.Array  # (3,) roll, pitch, yaw radians

    # VINS-provided initial guess pose (`initial_guess_*`)
    initial_guess_trans: jax.Array  # (3,)
    initial_guess_quat: jax.Array  # (4,) wxyz
    odom_reset_id: jax.Array  # () int32

    # clouds (deskewed dense extraction + features)
    xyz: jax.Array  # (P, 3) deskewed points, row-major by ring
    intensity: jax.Array  # (P,)
    valid: jax.Array  # (P,) bool
    num_valid: jax.Array  # () int32

    corner_xyz: jax.Array | None = None  # (E, 3) edge features
    corner_valid: jax.Array | None = None  # (E,)
    surf_xyz: jax.Array | None = None  # (S, 3) planar features
    surf_valid: jax.Array | None = None  # (S,)


@struct.dataclass
class Odometry:
    """nav_msgs/Odometry equivalent. ``aux`` carries the reference's
    covariance[0..7] side-channel payload explicitly typed:
    [reset_id/failure_count, bax, bay, baz, bgx, bgy, bgz, gravity]
    (`imuPreintegration.cpp:527-534`, `visualization.cpp:96`)."""

    stamp: jax.Array
    trans: jax.Array  # (3,)
    quat: jax.Array  # (4,) wxyz
    vel: jax.Array  # (3,) linear velocity (world or body per producer)
    ang_vel: jax.Array  # (3,)
    aux: jax.Array  # (8,) typed side-channel
    degenerate: jax.Array  # () bool — covariance[0] flag of the incremental odom
    # (`mapOptimization.cpp:1740-1743`)


@struct.dataclass
class FeatureFrame:
    """Visual feature frame ⇔ the 6-channel PointCloud of
    `feature_tracker_node.cpp:170-223`: per feature id, normalized-plane
    coordinates, pixel coordinates, normalized velocity, and lidar depth."""

    stamp: jax.Array
    ids: jax.Array  # (F,) int32, -1 = invalid
    xy_norm: jax.Array  # (F, 2) undistorted normalized plane (x, y at z=1)
    uv: jax.Array  # (F, 2) raw pixel coordinates
    vel: jax.Array  # (F, 2) normalized-plane velocity
    depth: jax.Array  # (F,) lidar depth, -1 = none
    valid: jax.Array  # (F,) bool


@struct.dataclass
class CameraImage:
    stamp: jax.Array
    image: jax.Array  # (H, W) uint8 or float32 grayscale


def pad_to(arr: jax.Array, capacity: int, axis: int = 0, fill=0):
    """Pad (or truncate) `arr` to `capacity` along `axis`; returns array."""
    n = arr.shape[axis]
    if n == capacity:
        return arr
    if n > capacity:
        sl = [slice(None)] * arr.ndim
        sl[axis] = slice(0, capacity)
        return arr[tuple(sl)]
    pad_widths = [(0, 0)] * arr.ndim
    pad_widths[axis] = (0, capacity - n)
    return jnp.pad(arr, pad_widths, constant_values=fill)


def validity_mask(n: int, capacity: int) -> jax.Array:
    return jnp.arange(capacity) < n


def tree_stamp(msg: Any) -> float:
    return float(msg.stamp)
