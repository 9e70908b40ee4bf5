"""Host-side LIO driver: wires the front-end stages and the mapping step
into one fused jitted per-scan call — the single-process equivalent of the
reference's imageProjection -> featureExtraction -> mapOptimization DDS
chain (SURVEY.md §3.1).

Per scan the host does only: pad/upload the raw points, enqueue ONE device
program (projection + deskew + LOAM features + map optimization + optional
loop closure under `lax.cond`), and append the device-resident pose to a
log. No per-scan readbacks — the dispatch queue stays full, hiding the
tunnel/dispatch latency of the axon TPU attachment.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ...core import lie
from . import frontend, mapping


@dataclasses.dataclass
class LioConfig:
    n_scan: int = 4
    horizon: int = 1800
    point_capacity: int = 8192
    imu_capacity: int = 64
    caps: mapping.LioCaps = dataclasses.field(default_factory=mapping.LioCaps)
    params: mapping.LioParams = dataclasses.field(default_factory=mapping.LioParams)
    min_range: float = 1.0
    max_range: float = 100.0
    edge_threshold: float = 1.0
    surf_threshold: float = 0.1
    odometry_surf_leaf: float = 0.4
    loop_closure_enabled: bool = True
    loop_every_n_scans: int = 10  # ~1 Hz at 10 Hz scan rate
    exact_loam_selection: bool = False


@partial(
    jax.jit,
    static_argnames=(
        "n_scan", "horizon", "min_range", "max_range", "edge_threshold",
        "surf_threshold", "surf_leaf", "caps", "params", "exact_selection",
        "point_capacity", "imu_capacity",
    ),
)
def lio_full_step(
    state: mapping.LioMapState,
    packed,  # (P*7 + M*4 + 16,) f32 — ONE transfer per scan: the axon
             # attachment pays ~5-8 ms latency per host->device copy, so all
             # inputs ride one flat buffer and are unpacked on device.
    *,
    n_scan, horizon, min_range, max_range,
    edge_threshold, surf_threshold, surf_leaf,
    caps: mapping.LioCaps, params: mapping.LioParams,
    point_capacity: int, imu_capacity: int,
    exact_selection: bool = False,
):
    """One fused LIS step: deskew/projection -> features -> mapping
    (-> loop closure when `do_loop`)."""
    P, M = point_capacity, imu_capacity
    pts = packed[: P * 7].reshape(P, 7)
    imu = packed[P * 7 : P * 7 + M * 4].reshape(M, 4)
    misc = packed[P * 7 + M * 4 :]
    xyz = pts[:, 0:3]
    intensity = pts[:, 3]
    ring = pts[:, 4].astype(jnp.int32)
    rel_time = pts[:, 5]
    point_valid = pts[:, 6] > 0.5
    imu_rel_time = imu[:, 0]
    imu_gyro = imu[:, 1:4]
    imu_count = misc[0].astype(jnp.int32)
    imu_rpy_init = misc[1:4]
    imu_available = misc[4] > 0.5
    stamp = misc[5]
    odom_available = misc[6] > 0.5
    odom_trans = misc[7:10]
    odom_quat = misc[10:14]
    odom_reset_id = misc[14].astype(jnp.int32)
    do_loop = misc[15] > 0.5

    proj = frontend.project_scan(
        xyz, intensity, ring, rel_time, point_valid,
        imu_rel_time, imu_gyro, imu_count, imu_rpy_init, imu_available,
        n_scan=n_scan, horizon=horizon,
        min_range=min_range, max_range=max_range,
    )
    feats = frontend.extract_features(
        proj,
        edge_threshold=edge_threshold,
        surf_threshold=surf_threshold,
        surf_leaf=surf_leaf,
        max_corner=caps.scan_corner,
        max_surf=caps.scan_surf,
        exact_selection=exact_selection,
    )
    scan_info = dict(
        stamp=stamp,
        imu_available=proj.imu_available,
        imu_rpy_init=proj.imu_rpy_init,
        odom_available=odom_available,
        odom_trans=odom_trans,
        odom_quat=odom_quat,
        odom_reset_id=odom_reset_id,
    )
    state, out = mapping.map_step(state, scan_info, feats, caps, params)

    def with_loop(state):
        new_state, _ = mapping.loop_closure_step(state, caps, params)
        return new_state

    state = jax.lax.cond(
        do_loop & (state.kf_count > 1), with_loop, lambda s: s, state
    )
    return state, out


class LioPipeline:
    """Per-scan LIO processing with device-resident state."""

    def __init__(self, cfg: LioConfig):
        self.cfg = cfg
        self.state = mapping.lio_init(cfg.caps)
        self.trajectory = []  # (stamp, x6 DeviceArray) log — lazy, no syncs
        self.scan_counter = 0
        self._step = partial(
            lio_full_step,
            n_scan=cfg.n_scan,
            horizon=cfg.horizon,
            min_range=cfg.min_range,
            max_range=cfg.max_range,
            edge_threshold=cfg.edge_threshold,
            surf_threshold=cfg.surf_threshold,
            surf_leaf=cfg.odometry_surf_leaf,
            caps=cfg.caps,
            params=cfg.params,
            point_capacity=cfg.point_capacity,
            imu_capacity=cfg.imu_capacity,
            exact_selection=cfg.exact_loam_selection,
        )

    def process_scan(
        self,
        scan: dict,
        imu_rel_time: np.ndarray,
        imu_gyro: np.ndarray,
        imu_rpy_init: np.ndarray | None,
        odom: dict | None = None,
    ):
        """scan: dict(xyz, intensity, ring, time, stamp). imu_*: samples
        covering the scan, times relative to scan start. odom: optional VINS
        initial-guess odometry (trans, quat, reset_id). Fully async: returns
        device arrays without syncing."""
        cfg = self.cfg
        P, M = cfg.point_capacity, cfg.imu_capacity
        self.scan_counter += 1
        do_loop = (
            cfg.loop_closure_enabled
            and self.scan_counter % cfg.loop_every_n_scans == 0
        )
        buf = np.zeros(P * 7 + M * 4 + 16, np.float32)
        pts = buf[: P * 7].reshape(P, 7)
        n = min(len(scan["xyz"]), P)
        pts[:n, 0:3] = scan["xyz"][:n]
        pts[:n, 3] = scan["intensity"][:n]
        pts[:n, 4] = scan["ring"][:n]
        pts[:n, 5] = scan["time"][:n]
        pts[:n, 6] = 1.0
        imu = buf[P * 7 : P * 7 + M * 4].reshape(M, 4)
        icount = min(len(imu_rel_time), M)
        imu[:icount, 0] = imu_rel_time[:icount]
        imu[:icount, 1:4] = imu_gyro[:icount]
        if 0 < icount < M:
            imu[icount:, 0] = imu_rel_time[icount - 1]
            imu[icount:, 1:4] = imu_gyro[icount - 1]
        misc = buf[P * 7 + M * 4 :]
        misc[0] = icount
        misc[1:4] = imu_rpy_init if imu_rpy_init is not None else 0.0
        misc[4] = float(imu_rpy_init is not None and icount > 1)
        misc[5] = scan["stamp"]
        misc[6] = float(odom is not None)
        misc[7:10] = odom["trans"] if odom else 0.0
        misc[10:14] = odom["quat"] if odom else (1.0, 0, 0, 0)
        misc[14] = odom["reset_id"] if odom else 0
        misc[15] = float(do_loop)
        # fresh buffer per scan: CPU backends may alias host memory, so a
        # reused buffer would corrupt in-flight async steps
        self.state, out = self._step(self.state, jnp.asarray(buf))
        self.trajectory.append((scan["stamp"], out.x6))
        return out

    def trajectory_array(self) -> np.ndarray:
        """Sync point: materialize the logged poses as (N, 6) numpy."""
        if not self.trajectory:
            return np.zeros((0, 6), np.float32)
        return np.stack([np.asarray(x6) for _, x6 in self.trajectory])

    def pose_matrix(self, x6=None):
        x6 = self.state.x6 if x6 is None else jnp.asarray(x6)
        return np.asarray(lie.pose6_to_matrix(x6))
