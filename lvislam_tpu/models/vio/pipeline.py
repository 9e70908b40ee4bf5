"""Visual-inertial-only runner (BASELINE configs 2 and 4): camera + IMU in,
tracked features + VIO states out — the estimator_node + feature_tracker
pair without the lidar subsystems (`estimator_node.cpp:290-401` process
thread + `feature_tracker_node.cpp` img_callback)."""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from ...core.config import CameraIntrinsics
from ...ops import ba
from . import estimator as est
from . import feature_manager as fm
from . import feature_tracker as ft


@dataclasses.dataclass
class VioRunnerConfig:
    camera: CameraIntrinsics = dataclasses.field(default_factory=CameraIntrinsics)
    tracker: ft.TrackerParams = dataclasses.field(default_factory=ft.TrackerParams)
    caps: fm.VioCaps = dataclasses.field(default_factory=fm.VioCaps)
    params: est.VioParams = dataclasses.field(default_factory=est.VioParams)
    ba: ba.BAConfig = dataclasses.field(default_factory=ba.BAConfig)
    image_height: int = 480
    image_width: int = 752
    freq: float = 10.0  # publish/process throttle (`feature_tracker_node.cpp:100-112`)
    tic: tuple = (0.0, 0.0, 0.0)
    qic: tuple = (1.0, 0.0, 0.0, 0.0)
    max_stream_gap: float = 1.0  # restart protocol (`:50-60`)


class VioRunner:
    def __init__(self, cfg: VioRunnerConfig):
        self.cfg = cfg
        self._reset()
        self.trajectory: list[tuple] = []

    def _reset(self):
        cfg = self.cfg
        self.tracker = ft.tracker_init(cfg.image_height, cfg.image_width, cfg.tracker)
        self.vio = est.vio_init(cfg.caps, cfg.params)
        self.vio = self.vio._replace(ws=self.vio.ws._replace(
            tic=jnp.array(cfg.tic, jnp.float32),
            qic=jnp.array(cfg.qic, jnp.float32),
        ))
        self.imu_t: list[float] = []
        self.imu_acc: list[np.ndarray] = []
        self.imu_gyr: list[np.ndarray] = []
        self.last_proc = -1.0
        self.last_img = -1.0

    def feed_imu(self, t, gyro, acc):
        self.imu_t.append(float(t))
        self.imu_gyr.append(np.asarray(gyro, np.float32))
        self.imu_acc.append(np.asarray(acc, np.float32))
        if len(self.imu_t) > 20000:
            del self.imu_t[:5000], self.imu_gyr[:5000], self.imu_acc[:5000]

    def feed_image(self, t, image):
        cfg = self.cfg
        # stream-gap restart (`feature_tracker_node.cpp:50-60` +
        # `estimator_node.cpp:268-287`)
        if self.last_img > 0 and (t - self.last_img) > cfg.max_stream_gap:
            fc = self.vio.failure_count
            self._reset()
            self.vio = self.vio._replace(failure_count=fc + 1)
        self.last_img = t
        # FREQ throttle
        if self.last_proc > 0 and (t - self.last_proc) < 1.0 / cfg.freq - 1e-6:
            # still track (the reference tracks every frame, publishes at FREQ)
            self.tracker, _ = ft.tracker_step(
                self.tracker, jnp.asarray(image, jnp.float32), jnp.float32(t),
                cfg.tracker, cfg.camera,
            )
            return None
        self.tracker, tout = ft.tracker_step(
            self.tracker, jnp.asarray(image, jnp.float32), jnp.float32(t),
            cfg.tracker, cfg.camera,
        )
        # IMU window since last processed frame
        M = cfg.caps.imu_buf
        ts = np.asarray(self.imu_t)
        if self.last_proc > 0 and len(ts):
            sel = np.nonzero((ts > self.last_proc) & (ts <= t))[0][:M]
            dts = np.zeros(M, np.float32)
            accs = np.zeros((M, 3), np.float32)
            gyrs = np.zeros((M, 3), np.float32)
            n = len(sel)
            if n:
                tt = ts[sel]
                dts[:n] = np.diff(tt, prepend=self.last_proc)
                accs[:n] = np.stack([self.imu_acc[i] for i in sel])
                gyrs[:n] = np.stack([self.imu_gyr[i] for i in sel])
                accs[n:] = accs[n - 1]
                gyrs[n:] = gyrs[n - 1]
                self.vio = est.process_imu(
                    self.vio, jnp.asarray(dts), jnp.asarray(accs),
                    jnp.asarray(gyrs), cfg.caps, cfg.params,
                )
        self.last_proc = t

        W1 = cfg.caps.window + 1
        no_seed = dict(
            available=jnp.array(False), Ps=jnp.zeros((W1, 3)),
            Qs=jnp.tile(jnp.array([1.0, 0, 0, 0]), (W1, 1)),
            Vs=jnp.zeros((W1, 3)), ba=jnp.zeros(3), bg=jnp.zeros(3),
        )
        N = cfg.caps.frame_features
        ids = np.asarray(tout.ids)[:N]
        self.vio, out = est.process_image(
            self.vio,
            jnp.asarray(np.pad(ids, (0, max(0, N - len(ids))), constant_values=-1)),
            tout.norm[:N], tout.vel[:N],
            jnp.full(N, -1.0), tout.valid[:N],
            no_seed, cfg.caps, cfg.params, cfg.ba,
        )
        if bool(np.asarray(out["initialized"])):
            self.trajectory.append((t, np.asarray(out["pos"]), np.asarray(out["quat"])))
        return out
