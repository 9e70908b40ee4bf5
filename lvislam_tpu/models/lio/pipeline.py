"""Host-side LIO driver: wires the front-end stages and the mapping step
into one per-scan call — the single-process equivalent of the reference's
imageProjection -> featureExtraction -> mapOptimization DDS chain
(SURVEY.md §3.1). Used by the replay harness, the integration tests, and
the benchmark."""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from ...core.config import SystemConfig
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


class LioPipeline:
    """Per-scan LIO processing with device-resident state."""

    def __init__(self, cfg: LioConfig):
        self.cfg = cfg
        self.state = mapping.lio_init(cfg.caps)
        self.trajectory = []  # (stamp, x6) log
        self.scan_counter = 0

    def _pad_points(self, scan):
        P = self.cfg.point_capacity
        n = len(scan["xyz"])
        idx = slice(0, min(n, P))
        xyz = np.zeros((P, 3), np.float32)
        xyz[: min(n, P)] = scan["xyz"][idx]
        inten = np.zeros(P, np.float32)
        inten[: min(n, P)] = scan["intensity"][idx]
        ring = np.zeros(P, np.int32)
        ring[: min(n, P)] = scan["ring"][idx]
        rel = np.zeros(P, np.float32)
        rel[: min(n, P)] = scan["time"][idx]
        valid = np.zeros(P, bool)
        valid[: min(n, P)] = True
        return xyz, inten, ring, rel, valid

    def _pad_imu(self, imu_t, imu_gyro):
        M = self.cfg.imu_capacity
        n = min(len(imu_t), M)
        t = np.zeros(M, np.float32)
        g = np.zeros((M, 3), np.float32)
        t[:n] = imu_t[:n]
        g[:n] = imu_gyro[:n]
        if n < M and n > 0:
            t[n:] = imu_t[n - 1]
            g[n:] = imu_gyro[n - 1]
        return t, g, n

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
        initial-guess odometry (trans, quat, reset_id)."""
        cfg = self.cfg
        xyz, inten, ring, rel, valid = self._pad_points(scan)
        it, ig, icount = self._pad_imu(imu_rel_time, imu_gyro)

        proj = frontend.project_scan(
            jnp.array(xyz), jnp.array(inten), jnp.array(ring), jnp.array(rel),
            jnp.array(valid), jnp.array(it), jnp.array(ig), jnp.int32(icount),
            jnp.array(imu_rpy_init if imu_rpy_init is not None else np.zeros(3), jnp.float32),
            jnp.array(imu_rpy_init is not None and icount > 1),
            n_scan=cfg.n_scan, horizon=cfg.horizon,
            min_range=cfg.min_range, max_range=cfg.max_range,
        )
        feats = frontend.extract_features(
            proj,
            edge_threshold=cfg.edge_threshold,
            surf_threshold=cfg.surf_threshold,
            surf_leaf=cfg.odometry_surf_leaf,
            max_corner=cfg.caps.scan_corner,
            max_surf=cfg.caps.scan_surf,
        )
        scan_info = dict(
            stamp=jnp.float32(scan["stamp"]),
            imu_available=proj.imu_available,
            imu_rpy_init=proj.imu_rpy_init,
            odom_available=jnp.array(odom is not None),
            odom_trans=jnp.array(odom["trans"] if odom else np.zeros(3), jnp.float32),
            odom_quat=jnp.array(odom["quat"] if odom else [1, 0, 0, 0], jnp.float32),
            odom_reset_id=jnp.int32(odom["reset_id"] if odom else 0),
        )
        self.state, out = mapping.map_step(
            self.state, scan_info, feats, cfg.caps, cfg.params
        )
        self.scan_counter += 1
        if (
            cfg.loop_closure_enabled
            and self.scan_counter % cfg.loop_every_n_scans == 0
            and int(self.state.kf_count) > 1
        ):
            self.state, _ = mapping.loop_closure_step(self.state, cfg.caps, cfg.params)

        x6 = np.asarray(out.x6)
        self.trajectory.append((scan["stamp"], x6))
        return out

    def pose_matrix(self, x6=None):
        x6 = self.state.x6 if x6 is None else jnp.asarray(x6)
        return np.asarray(lie.pose6_to_matrix(x6))
