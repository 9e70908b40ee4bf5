"""Synthetic sensor simulation — the deterministic data source for replay
integration tests and benchmarks (SURVEY.md §4 item 3: "the BASELINE configs
are the integration tests"; the reference has no test data at all).

Simulates the reference's sensor suite (`readme.md:83-90`):
- a MID360-style spinning multi-beam lidar by analytic raycasting against a
  world of axis-aligned planes and vertical cylinders (poles), with
  per-point time offsets so motion skew is physically real;
- a 6-axis IMU from analytic derivatives of a smooth SE(3) trajectory
  (specific force in body frame + body angular rate, with optional bias and
  noise);
- a mono camera via procedural-texture raycasting (for KLT tests) and exact
  3D landmark projections (for BA tests).

Everything is host-side NumPy float64: the simulator plays the role of the
sensor drivers + rosbag, not of the TPU compute path.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import numpy as np
from scipy.spatial.transform import Rotation as Rsc

GRAVITY = 9.81


# ---------------------------------------------------------------------------
# World geometry
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class World:
    # planes: point p0, normal n (unit), half-extents (a_len, b_len) along
    # in-plane axes a, b
    plane_p0: np.ndarray  # (P, 3)
    plane_n: np.ndarray  # (P, 3)
    plane_a: np.ndarray  # (P, 3)
    plane_b: np.ndarray  # (P, 3)
    plane_ext: np.ndarray  # (P, 2)
    # vertical cylinders: center (cx, cy), radius, z range
    cyl_c: np.ndarray  # (C, 2)
    cyl_r: np.ndarray  # (C,)
    cyl_z: np.ndarray  # (C, 2)


def default_world(seed: int = 0, size: float = 14.0) -> World:
    """A room: floor + ceiling + 4 walls + interior boxes + poles."""
    rng = np.random.default_rng(seed)
    planes = []

    def add_plane(p0, n, a, b, ea, eb):
        planes.append((np.array(p0, float), np.array(n, float) / np.linalg.norm(n),
                       np.array(a, float), np.array(b, float), np.array([ea, eb], float)))

    s = size
    add_plane([0, 0, -1.6], [0, 0, 1], [1, 0, 0], [0, 1, 0], s, s)  # floor
    add_plane([0, 0, 2.6], [0, 0, -1], [1, 0, 0], [0, 1, 0], s, s)  # ceiling
    add_plane([s, 0, 0.5], [-1, 0, 0], [0, 1, 0], [0, 0, 1], s, 2.2)
    add_plane([-s, 0, 0.5], [1, 0, 0], [0, 1, 0], [0, 0, 1], s, 2.2)
    add_plane([0, s, 0.5], [0, -1, 0], [1, 0, 0], [0, 0, 1], s, 2.2)
    add_plane([0, -s, 0.5], [0, 1, 0], [1, 0, 0], [0, 0, 1], s, 2.2)
    # interior boxes (two faces each, avoid center where trajectory lives)
    for _ in range(6):
        cx, cy = rng.uniform(-s * 0.7, s * 0.7, 2)
        if np.hypot(cx, cy) < 5.0:
            cx += np.sign(cx or 1.0) * 5.0
        w = rng.uniform(0.8, 2.0)
        add_plane([cx + w, cy, 0.0], [1, 0, 0], [0, 1, 0], [0, 0, 1], w, 1.5)
        add_plane([cx, cy + w, 0.0], [0, 1, 0], [1, 0, 0], [0, 0, 1], w, 1.5)

    cyl_c, cyl_r, cyl_z = [], [], []
    for _ in range(10):
        c = rng.uniform(-s * 0.8, s * 0.8, 2)
        if np.hypot(*c) < 4.0:
            c = c + np.sign(c) * 4.0
        cyl_c.append(c)
        cyl_r.append(rng.uniform(0.06, 0.15))
        cyl_z.append([-1.6, 2.6])

    return World(
        plane_p0=np.stack([p[0] for p in planes]),
        plane_n=np.stack([p[1] for p in planes]),
        plane_a=np.stack([p[2] for p in planes]),
        plane_b=np.stack([p[3] for p in planes]),
        plane_ext=np.stack([p[4] for p in planes]),
        cyl_c=np.array(cyl_c),
        cyl_r=np.array(cyl_r),
        cyl_z=np.array(cyl_z),
    )


def raycast(world: World, origins: np.ndarray, dirs: np.ndarray, max_range: float = 100.0):
    """Batch ray-world intersection. origins/dirs (N, 3). Returns ranges (N,)
    (inf = miss)."""
    N = origins.shape[0]
    best = np.full(N, np.inf)

    # planes
    for i in range(world.plane_p0.shape[0]):
        n = world.plane_n[i]
        denom = dirs @ n
        tnum = (world.plane_p0[i] - origins) @ n
        with np.errstate(divide="ignore", invalid="ignore"):
            t = tnum / denom
        hit = (t > 0.05) & (t < max_range) & (np.abs(denom) > 1e-9)
        pts = origins + t[:, None] * dirs
        rel = pts - world.plane_p0[i]
        ua = rel @ world.plane_a[i]
        ub = rel @ world.plane_b[i]
        hit &= (np.abs(ua) <= world.plane_ext[i, 0]) & (np.abs(ub) <= world.plane_ext[i, 1])
        best = np.where(hit & (t < best), t, best)

    # vertical cylinders: solve |o_xy + t d_xy - c|^2 = r^2
    for i in range(world.cyl_c.shape[0]):
        oc = origins[:, :2] - world.cyl_c[i]
        d2 = dirs[:, :2]
        a = np.sum(d2 * d2, axis=1)
        b = 2 * np.sum(oc * d2, axis=1)
        c = np.sum(oc * oc, axis=1) - world.cyl_r[i] ** 2
        disc = b * b - 4 * a * c
        with np.errstate(invalid="ignore", divide="ignore"):
            t = (-b - np.sqrt(np.maximum(disc, 0))) / (2 * a)
        z = origins[:, 2] + t * dirs[:, 2]
        hit = (disc > 0) & (a > 1e-12) & (t > 0.05) & (t < max_range)
        hit &= (z >= world.cyl_z[i, 0]) & (z <= world.cyl_z[i, 1])
        best = np.where(hit & (t < best), t, best)

    return best


# ---------------------------------------------------------------------------
# Trajectory
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class Trajectory:
    """Smooth analytic SE(3) trajectory p(t), R(t) with derivatives."""

    pos_fn: Callable[[np.ndarray], np.ndarray]  # (T,) -> (T, 3)
    rpy_fn: Callable[[np.ndarray], np.ndarray]  # (T,) -> (T, 3) roll,pitch,yaw rad

    def pose(self, t):
        t = np.atleast_1d(np.asarray(t, float))
        p = self.pos_fn(t)
        rpy = self.rpy_fn(t)
        R = Rsc.from_euler("ZYX", rpy[:, ::-1]).as_matrix()  # Rz(y)Ry(p)Rx(r)
        return p, R

    def imu(self, t, dt=1e-4):
        """Ideal IMU: body angular velocity + specific force at times t."""
        t = np.asarray(t, float)
        p0, R0 = self.pose(t)
        # angular velocity via central difference of rotations
        _, Rp = self.pose(t + dt)
        _, Rm = self.pose(t - dt)
        dR = np.einsum("nij,nik->njk", Rm, Rp)  # Rm^T Rp  ≈ exp(2 dt ω_body)
        w_body = Rsc.from_matrix(dR).as_rotvec() / (2 * dt)
        # linear acceleration via central difference
        pp, _ = self.pose(t + dt)
        pm, _ = self.pose(t - dt)
        a_world = (pp - 2 * p0 + pm) / dt**2
        g_world = np.array([0.0, 0.0, -GRAVITY])
        f_body = np.einsum("nij,ni->nj", R0, a_world - g_world)  # R^T (a - g)
        return w_body, f_body


def figure8_trajectory(scale: float = 4.0, period: float = 40.0, z_amp: float = 0.15) -> Trajectory:
    w = 2 * np.pi / period

    def pos(t):
        return np.stack(
            [scale * np.sin(w * t), scale * np.sin(2 * w * t) / 1.5, z_amp * np.sin(3 * w * t)],
            axis=-1,
        )

    def rpy(t):
        # yaw follows the velocity direction; gentle roll/pitch oscillation
        vx = scale * w * np.cos(w * t)
        vy = scale * 2 * w * np.cos(2 * w * t) / 1.5
        yaw = np.unwrap(np.arctan2(vy, vx))
        return np.stack(
            [0.05 * np.sin(2 * w * t), 0.05 * np.cos(3 * w * t), yaw], axis=-1
        )

    return Trajectory(pos_fn=pos, rpy_fn=rpy)


def circle_trajectory(radius: float = 3.0, period: float = 8.0,
                      z_amp: float = 0.1) -> Trajectory:
    """Closed circular orbit with tangent heading: the pose at t + period is
    IDENTICAL to the pose at t — the revisit a loop-closure test needs."""
    w = 2 * np.pi / period

    def pos(t):
        return np.stack(
            [radius * np.cos(w * t), radius * np.sin(w * t),
             z_amp * np.sin(2 * w * t)],
            axis=-1,
        )

    def rpy(t):
        yaw = np.unwrap(np.asarray(w * t + np.pi / 2, float))
        z = np.zeros_like(yaw)
        return np.stack([z, z, yaw], axis=-1)

    return Trajectory(pos_fn=pos, rpy_fn=rpy)


# ---------------------------------------------------------------------------
# Sensor streams
# ---------------------------------------------------------------------------

def simulate_imu_stream(
    traj: Trajectory,
    t0: float,
    t1: float,
    rate: float = 200.0,
    accel_noise: float = 0.0,
    gyro_noise: float = 0.0,
    accel_bias=(0.0, 0.0, 0.0),
    gyro_bias=(0.0, 0.0, 0.0),
    seed: int = 0,
):
    """Returns (stamps, gyro (N,3), acc (N,3)) including bias + white noise."""
    rng = np.random.default_rng(seed)
    stamps = np.arange(t0, t1, 1.0 / rate)
    w, f = traj.imu(stamps)
    w = w + np.asarray(gyro_bias) + gyro_noise * rng.standard_normal(w.shape)
    f = f + np.asarray(accel_bias) + accel_noise * rng.standard_normal(f.shape)
    return stamps, w, f


def simulate_lidar_scan(
    world: World,
    traj: Trajectory,
    t_start: float,
    n_scan: int = 4,
    horizon: int = 1800,
    sweep_time: float = 0.1,
    max_range: float = 100.0,
    range_noise: float = 0.0,
    seed: int = 0,
):
    """One sweep of a spinning n_scan-beam lidar. Each azimuth step fires all
    beams from the sensor pose at its own time — skew is real. Returns dict
    with xyz (in the scan-start sensor frame of each point's TRUE pose — i.e.
    raw, skewed measurements in the *sensor frame at measurement time*,
    expressed as the lidar reports them), ring, time, plus ground truth pose
    at scan start."""
    rng = np.random.default_rng(seed + int(t_start * 1000) % 100000)
    elev = np.deg2rad(np.linspace(-12, 12, n_scan))
    az = np.linspace(0, 2 * np.pi, horizon, endpoint=False)
    times = t_start + sweep_time * (np.arange(horizon) / horizon)

    p_t, R_t = traj.pose(times)  # (H, 3), (H, 3, 3)

    rings = []
    for r, el in enumerate(elev):
        d_body = np.stack(
            [np.cos(el) * np.cos(az), np.cos(el) * np.sin(az), np.full_like(az, np.sin(el))],
            axis=-1,
        )  # (H, 3)
        d_world = np.einsum("nij,nj->ni", R_t, d_body)
        rngs = raycast(world, p_t, d_world, max_range)
        if range_noise > 0:
            rngs = rngs + range_noise * rng.standard_normal(rngs.shape)
        hit = np.isfinite(rngs)
        # measured point in sensor frame at measurement time
        xyz_meas = d_body * rngs[:, None]
        rings.append(
            dict(xyz=xyz_meas[hit], time=times[hit] - t_start,
                 ring=np.full(hit.sum(), r, np.int32))
        )

    xyz = np.concatenate([r["xyz"] for r in rings])
    time = np.concatenate([r["time"] for r in rings])
    ring = np.concatenate([r["ring"] for r in rings])
    # interleave by time (Livox-style time-ordered stream)
    order = np.argsort(time, kind="stable")
    p0, R0 = traj.pose(np.array([t_start]))
    return dict(
        stamp=t_start,
        xyz=xyz[order].astype(np.float32),
        time=time[order].astype(np.float32),
        ring=ring[order],
        intensity=np.ones(len(order), np.float32),
        true_pos=p0[0],
        true_R=R0[0],
    )


def procedural_texture(pts: np.ndarray) -> np.ndarray:
    """Deterministic pseudo-random intensity from 3D position — a 'painted'
    world for photometric (KLT) simulation. Smooth-ish multi-frequency hash."""
    # wavelengths 0.5-4 m: smooth at typical pixel footprints so photometric
    # tracking (LK) sees valid gradients instead of aliasing noise
    v = (
        np.sin(pts @ np.array([1.7, 2.9, 1.3])) * 0.45
        + np.sin(pts @ np.array([4.1, 3.3, 5.7]) + 1.3) * 0.35
        + np.sin(pts @ np.array([8.9, 7.1, 11.3]) + 2.1) * 0.2
    )
    return (0.5 + 0.45 * v).astype(np.float32)


_RAY_GRID_CACHE: dict = {}


def camera_ray_grid(cam) -> np.ndarray:
    """Unit ray per pixel for an arbitrary `CameraIntrinsics` (any of the
    four camodocal models via `ops.camera.lift_projective`) — the static
    part of rendering, computed once per intrinsics and cached. Pinned to
    the CPU backend so bench-time rendering never round-trips the TPU
    tunnel."""
    key = (cam.model_type, cam.image_width, cam.image_height, cam.gamma1,
           cam.gamma2, cam.u0, cam.v0, cam.k1, cam.k2, cam.p1, cam.p2,
           getattr(cam, "xi", 0.0))
    hit = _RAY_GRID_CACHE.get(key)
    if hit is not None:
        return hit
    import jax
    import jax.numpy as jnp

    from ..ops import camera as camops

    u, v = np.meshgrid(np.arange(cam.image_width), np.arange(cam.image_height))
    uv = np.stack([u, v], axis=-1).reshape(-1, 2).astype(np.float32)
    with jax.default_device(jax.devices("cpu")[0]):
        rays = np.asarray(camops.lift_projective(jnp.asarray(uv), cam),
                          np.float64)
    rays /= np.linalg.norm(rays, axis=-1, keepdims=True)
    _RAY_GRID_CACHE[key] = rays
    return rays


def render_camera_image(
    world: World,
    traj: Trajectory,
    t: float,
    width: int = 320,
    height: int = 240,
    f: float = 200.0,
    R_cam_body: np.ndarray | None = None,
    t_cam_body: np.ndarray | None = None,
    cam=None,
):
    """Raycast an image of the procedurally textured world: a centered
    pinhole at (width, height, f) by default, or — when `cam` (a
    `CameraIntrinsics`) is given — through the full camera model including
    its distortion/mirror geometry (e.g. the reference rig's MEI 1024x576,
    `params_camera.yaml`), so full-scale replays exercise the real
    undistortion path."""
    p, R = traj.pose(np.array([t]))
    p, R = p[0], R[0]
    if R_cam_body is None:
        # camera x right, y down, z forward; body x forward, y left, z up
        R_cam_body = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], float).T
    if t_cam_body is None:
        t_cam_body = np.zeros(3)
    if cam is not None:
        width, height = cam.image_width, cam.image_height
        d_cam = camera_ray_grid(cam)
    else:
        u, v = np.meshgrid(np.arange(width), np.arange(height))
        d_cam = np.stack(
            [(u - width / 2) / f, (v - height / 2) / f, np.ones_like(u, float)],
            axis=-1,
        ).reshape(-1, 3)
        d_cam = d_cam / np.linalg.norm(d_cam, axis=-1, keepdims=True)
    R_wc = R @ R_cam_body
    origin = p + R @ t_cam_body
    d_world = d_cam @ R_wc.T
    rngs = raycast(world, np.broadcast_to(origin, d_world.shape), d_world)
    pts = origin + d_world * np.where(np.isfinite(rngs), rngs, 0.0)[:, None]
    img = np.where(np.isfinite(rngs), procedural_texture(pts), 0.0)
    return img.reshape(height, width).astype(np.float32)


def landmark_points(world: World, n: int = 500, seed: int = 0) -> np.ndarray:
    """Random well-distributed 3D landmarks on world surfaces (for SfM/BA
    synthetic feature tracks)."""
    rng = np.random.default_rng(seed)
    pts = []
    P = world.plane_p0.shape[0]
    for i in range(P):
        k = max(2, n // P)
        ua = rng.uniform(-1, 1, k) * world.plane_ext[i, 0]
        ub = rng.uniform(-1, 1, k) * world.plane_ext[i, 1]
        pts.append(
            world.plane_p0[i]
            + ua[:, None] * world.plane_a[i]
            + ub[:, None] * world.plane_b[i]
        )
    return np.concatenate(pts)[:n]
