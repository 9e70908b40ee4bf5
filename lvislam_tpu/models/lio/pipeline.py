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
import queue
import threading
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ...core import lie
from . import frontend, mapping


_EXT_IDENTITY = (1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0)


@dataclasses.dataclass
class LioConfig:
    n_scan: int = 4
    horizon: int = 1800
    point_capacity: int = 8192
    imu_capacity: int = 64
    # IMU->lidar extrinsic rotations (`params_lidar.yaml` extrinsicRot /
    # extrinsicRPY, row-major 3x3): every IMU sample entering the LIS is
    # rotated into the lidar frame first — the reference's `imuConverter`
    # (`lidar_odometry/src/utility.h:315-349`, applied at
    # `imageProjection.cpp:193` and `imuPreintegration.cpp:482`). Applied
    # here in `pack_scan` (the imageProjection entry); the fusion-glue /
    # seed windows convert in `LviSystem` (the imuPreintegration entry).
    ext_rot: tuple = _EXT_IDENTITY
    ext_rpy: tuple = _EXT_IDENTITY
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
    # >1 = replay mode: stage K packed scans on the host and ship them in
    # ONE device_put, then dispatch K steps that index rows on-device. The
    # axon tunnel charges ~25 ms latency PER transfer RPC (size-insensitive
    # up to ~1 MB), so per-scan uploads cap the replay at ~27 ms/scan even
    # though compute is ~16 ms. Live operation keeps 1 (no added latency).
    upload_batch: int = 1
    # replay mode only: hold each full batch back one flush so its upload
    # overlaps the PREVIOUS batch's device execution (depth-1 software
    # pipeline, no threads). Measured 10.8 -> ~9 ms/scan on the tunnel
    # (device-resident floor 8.4). Adds one batch of latency — irrelevant
    # for replay, which is why it is gated on upload_batch > 1.
    pipelined_uploads: bool = True
    # replay mode only: run ALL device interaction (batch upload + batch
    # dispatch) on ONE background worker thread. The axon tunnel blocks the
    # calling thread ~25 ms per RPC (NOTES.md) — two RPCs per batch that the
    # depth-1 pipeline above can only partially hide. RPC waits are IO-bound
    # (the GIL is released), so a worker thread overlaps them with the main
    # thread's packing AND the device's execution of the previous batch even
    # on a 1-core host. Single worker + FIFO queue preserves ordering, so
    # results are bit-identical to the synchronous path (tested in
    # test_lio_integration.py). Takes precedence over pipelined_uploads.
    async_dispatch: bool = True


# Quantization of the per-scan upload (the axon tunnel moves ~26 MB/s, so
# the wire time of the packed buffer — not device compute — capped the
# replay rate at f32 sizes). Positions ship as int16 at 3 mm quanta (well
# under lidar range noise, ~2 cm), relative times at 4 us quanta; IMU and
# misc floats are bit-cast into the same int16 buffer. 760 KB -> 296 KB.
POS_SCALE = 0.003  # m per quantum; +/-32767 -> +/-98.3 m
TIME_SCALE = 4e-6  # s per quantum; covers 0.13 s sweeps


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
    packed,  # (P*6 + M*8 + 48,) int16 — ONE transfer per scan: the axon
             # attachment pays per-copy latency AND is bandwidth-bound, so
             # all inputs ride one flat quantized buffer unpacked on device.
    odom_override=None,  # optional device-resident VINS guess
                         # (avail, trans(3), quat(4), reset_id) replacing
                         # the packed odom fields — the fused batched
                         # replay keeps exchange 1 on-device (replay.py)
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
    pts = packed[: P * 6].reshape(6, P)  # planar rows (see pack_scan)
    imu = jax.lax.bitcast_convert_type(
        packed[P * 6 : P * 6 + M * 8].reshape(M, 4, 2), jnp.float32
    )
    misc = jax.lax.bitcast_convert_type(
        packed[P * 6 + M * 8 :].reshape(24, 2), jnp.float32
    )
    xyz = pts[0:3].astype(jnp.float32).T * POS_SCALE
    intensity = pts[3].astype(jnp.float32)
    ring_valid = pts[4].astype(jnp.int32)
    ring = ring_valid % 256
    rel_time = pts[5].astype(jnp.float32) * TIME_SCALE
    point_valid = ring_valid >= 256
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
    if odom_override is not None:
        odom_available, odom_trans, odom_quat, odom_reset_id = odom_override
        odom_reset_id = odom_reset_id.astype(jnp.int32)
    do_loop = misc[15] > 0.5
    gps_available = misc[16] > 0.5
    gps_pos = misc[17:20]
    gps_noise = misc[20:23]
    gps_use_elevation = misc[23] > 0.5

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
        gps_available=gps_available,
        gps_pos=gps_pos,
        gps_noise=gps_noise,
        gps_use_elevation=gps_use_elevation,
    )
    state, out = mapping.map_step(state, scan_info, feats, caps, params)

    def with_loop(state):
        new_state, _ = mapping.loop_closure_step(state, caps, params)
        return new_state

    state = jax.lax.cond(
        do_loop & (state.kf_count > 1), with_loop, lambda s: s, state
    )
    return state, out


@partial(
    jax.jit,
    static_argnames=(
        "n_scan", "horizon", "min_range", "max_range", "edge_threshold",
        "surf_threshold", "surf_leaf", "caps", "params", "exact_selection",
        "point_capacity", "imu_capacity",
    ),
)
def lio_full_step_row(state, arr, k, **kw):
    """`lio_full_step` on row `k` of a staged (K, L) batch already resident
    on device — the row select happens inside the program, so batched-upload
    replay adds zero extra host->device round trips per scan."""
    return lio_full_step(state, arr[k], **kw)  # nested jit inlines


@partial(
    jax.jit,
    static_argnames=(
        "n_scan", "horizon", "min_range", "max_range", "edge_threshold",
        "surf_threshold", "surf_leaf", "caps", "params", "exact_selection",
        "point_capacity", "imu_capacity",
    ),
)
def lio_batch_step(state, arr, **kw):
    """K chained LIO steps in ONE program (`lax.scan` over the staged rows):
    replay mode pays one transfer RPC and one dispatch RPC per K scans —
    on the axon tunnel each RPC costs milliseconds, so per-scan round trips
    (not compute) otherwise bound the replay rate. Returns the per-row
    poses (K, 6) for the trajectory log."""

    def body(st, row):
        st, out = lio_full_step(st, row, **kw)
        return st, out.x6

    return jax.lax.scan(body, state, arr)


def ext_matrix(v) -> np.ndarray | None:
    """Row-major 9-tuple -> (3,3) float64, or None when identity (the
    shipped rig) so the hot packing path can skip the rotation."""
    R = np.asarray(v, np.float64).reshape(3, 3)
    return None if np.allclose(R, np.eye(3)) else R


def _rpy_to_matrix(rpy):
    r, p, y = float(rpy[0]), float(rpy[1]), float(rpy[2])
    cr, sr, cp, sp, cy, sy = np.cos(r), np.sin(r), np.cos(p), np.sin(p), np.cos(y), np.sin(y)
    return np.array([
        [cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr],
        [sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr],
        [-sp, cp * sr, cp * cr],
    ])


def _matrix_to_rpy(R):
    return np.array([
        np.arctan2(R[2, 1], R[2, 2]),
        -np.arcsin(np.clip(R[2, 0], -1.0, 1.0)),
        np.arctan2(R[1, 0], R[0, 0]),
    ], np.float32)


def rpy_to_lidar(rpy, ext_rpy) -> np.ndarray:
    """Rotate a 9-axis attitude into the lidar frame: q_final = q_from *
    extQRPY (`utility.h:334-335` — upstream LIO-SAM semantics; this fork
    pins q_final = extQRPY because its MID360 rig has no orientation, which
    our rpy=None path models). No-op for identity extrinsicRPY."""
    R_ext = ext_matrix(ext_rpy)
    if R_ext is None or rpy is None:
        return rpy
    return _matrix_to_rpy(_rpy_to_matrix(rpy) @ R_ext)


def pack_scan(
    cfg: LioConfig,
    scan: dict,
    imu_rel_time: np.ndarray,
    imu_gyro: np.ndarray,
    imu_rpy_init: np.ndarray | None,
    odom: dict | None = None,
    gps: dict | None = None,
    do_loop: bool = False,
) -> np.ndarray:
    """Quantize one scan + its IMU window + misc flags into the flat int16
    upload buffer `lio_full_step` unpacks on device (layout documented
    there)."""
    P, M = cfg.point_capacity, cfg.imu_capacity
    # IMU->lidar extrinsic (`imuConverter`, utility.h:315-349): gyro rotated
    # by extRot, attitude composed with extQRPY, before anything else reads
    # the samples (here: the deskew rotation table + the RPY initial guess)
    R_ext = ext_matrix(cfg.ext_rot)
    if R_ext is not None and len(imu_gyro):
        imu_gyro = np.asarray(imu_gyro) @ R_ext.T
    imu_rpy_init = rpy_to_lidar(imu_rpy_init, cfg.ext_rpy)
    buf = np.zeros(P * 6 + M * 8 + 48, np.int16)
    # planar (6, P) field rows: each field is lane-contiguous on device, so
    # the int16 -> f32 dequant runs on full tiles (a (P, 6) layout pads the
    # 6-wide minor dim to 128 lanes and wastes ~95% of the VPU)
    pts = buf[: P * 6].reshape(6, P)
    n = min(len(scan["xyz"]), P)
    np.clip(np.round(np.asarray(scan["xyz"][:n]).T / POS_SCALE), -32767,
            32767, out=pts[0:3, :n], casting="unsafe")
    np.clip(np.round(scan["intensity"][:n]), -32767, 32767,
            out=pts[3, :n], casting="unsafe")
    pts[4, :n] = np.asarray(scan["ring"][:n], np.int16) + 256
    np.clip(np.round(scan["time"][:n] / TIME_SCALE), 0, 32767,
            out=pts[5, :n], casting="unsafe")
    imu = buf[P * 6 : P * 6 + M * 8].view(np.float32).reshape(M, 4)
    icount = min(len(imu_rel_time), M)
    imu[:icount, 0] = imu_rel_time[:icount]
    imu[:icount, 1:4] = imu_gyro[:icount]
    if 0 < icount < M:
        imu[icount:, 0] = imu_rel_time[icount - 1]
        imu[icount:, 1:4] = imu_gyro[icount - 1]
    misc = buf[P * 6 + M * 8 :].view(np.float32)
    misc[0] = icount
    misc[1:4] = imu_rpy_init if imu_rpy_init is not None else 0.0
    misc[4] = float(imu_rpy_init is not None and icount > 1)
    misc[5] = scan["stamp"]
    misc[6] = float(odom is not None)
    misc[7:10] = odom["trans"] if odom else 0.0
    misc[10:14] = odom["quat"] if odom else (1.0, 0, 0, 0)
    misc[14] = odom["reset_id"] if odom else 0
    misc[15] = float(do_loop)
    misc[16] = float(gps is not None)
    misc[17:20] = gps["pos"] if gps else 0.0
    misc[20:23] = gps["noise"] if gps else 0.0
    misc[23] = float(gps.get("use_elevation", False)) if gps else 0.0
    return buf


class LioPipeline:
    """Per-scan LIO processing with device-resident state."""

    def __init__(self, cfg: LioConfig):
        self.cfg = cfg
        self.state = mapping.lio_init(cfg.caps)
        self.trajectory = []  # (stamp, x6 DeviceArray) log — lazy, no syncs
        self.scan_counter = 0
        self._staged: list = []  # (buf, stamp) awaiting a batched upload
        # pipelined replay: an uploaded-but-not-yet-dispatched full batch
        self._resident: tuple | None = None
        # async replay: device-RPC worker (started on first full batch)
        self._work_q: queue.Queue | None = None
        self._worker: threading.Thread | None = None
        self._worker_exc: BaseException | None = None
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
        _row_kw = dict(
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
        self._step_row = partial(lio_full_step_row, **_row_kw)
        self._batch_step = partial(lio_batch_step, **_row_kw)
        # device-resident row indices for partial-batch flushes: a fresh
        # jnp scalar per row would cost one tunnel transfer RPC (~25 ms)
        self._row_ids = [jnp.asarray(np.int32(k))
                         for k in range(max(1, cfg.upload_batch))]

    def process_scan(
        self,
        scan: dict,
        imu_rel_time: np.ndarray,
        imu_gyro: np.ndarray,
        imu_rpy_init: np.ndarray | None,
        odom: dict | None = None,
        gps: dict | None = None,
    ):
        """scan: dict(xyz, intensity, ring, time, stamp). imu_*: samples
        covering the scan, times relative to scan start. odom: optional VINS
        initial-guess odometry (trans, quat, reset_id). gps: optional
        map-frame GPS fix (pos (3,), noise (3,) variances, use_elevation) —
        staleness-gate it host-side (|t_gps - t_scan| < 0.2 s, the
        reference's queue pop, `mapOptimization.cpp:1444-1452`). Fully
        async: returns device arrays without syncing."""
        cfg = self.cfg
        self.scan_counter += 1
        do_loop = (
            cfg.loop_closure_enabled
            and self.scan_counter % cfg.loop_every_n_scans == 0
        )
        buf = pack_scan(cfg, scan, imu_rel_time, imu_gyro, imu_rpy_init,
                        odom=odom, gps=gps, do_loop=do_loop)
        if cfg.upload_batch > 1:
            self._staged.append((buf, scan["stamp"]))
            if len(self._staged) >= cfg.upload_batch:
                self._ship_full_batch()
            return None  # outputs land in `trajectory` at flush time
        # fresh buffer per scan: CPU backends may alias host memory, so a
        # reused buffer would corrupt in-flight async steps
        self.state, out = self._step(self.state, jnp.asarray(buf))
        self.trajectory.append((scan["stamp"], out.x6))
        return out

    def _ship_full_batch(self):
        """Hand the staged full batch to the device. Async mode: enqueue the
        host buffers for the RPC worker (upload + dispatch happen off the
        main thread). Pipelined mode: upload now, hold resident, dispatch the
        PREVIOUS batch so this upload's tunnel RPC rides under that batch's
        device execution. Plain mode: upload + dispatch inline."""
        if self.cfg.async_dispatch:
            rows = [b for b, _ in self._staged]
            stamps = tuple(st for _, st in self._staged)
            self._staged = []
            self._submit(rows, stamps)
            return
        arr = jnp.asarray(np.stack([b for b, _ in self._staged]))
        stamps = tuple(st for _, st in self._staged)
        self._staged = []
        if not self.cfg.pipelined_uploads:
            self.state, x6s = self._batch_step(self.state, arr)
            self.trajectory.append((stamps, x6s))
            return
        if self._resident is not None:
            self._dispatch_resident()
        self._resident = (arr, stamps)

    def _submit(self, rows: list, stamps: tuple):
        if self._worker is None:
            self._work_q = queue.Queue()
            self._worker = threading.Thread(
                target=self._worker_loop, name="lio-rpc-worker", daemon=True
            )
            self._worker.start()
        self._work_q.put((rows, stamps))

    def _worker_loop(self):
        """Sequential device interaction for enqueued batches. Owns
        `self.state` while the queue is non-empty — the main thread only
        touches state after `_drain_worker()` (every flush())."""
        while True:
            item = self._work_q.get()
            try:
                if item is None:
                    return
                if self._worker_exc is not None:
                    continue  # drain remaining items after a failure
                rows, stamps = item
                arr = jnp.asarray(np.stack(rows))
                self.state, x6s = self._batch_step(self.state, arr)
                self.trajectory.append((stamps, x6s))
            except BaseException as e:  # surfaced at the next flush()
                self._worker_exc = e
            finally:
                self._work_q.task_done()

    def _drain_worker(self):
        if self._work_q is not None:
            self._work_q.join()
        if self._worker_exc is not None:
            exc, self._worker_exc = self._worker_exc, None
            raise exc

    def close(self):
        """Stop the RPC worker (idempotent). Optional — the worker is a
        daemon thread that idles on an empty queue otherwise."""
        if self._worker is not None:
            self._work_q.put(None)
            self._worker.join()
            self._worker = None
            self._work_q = None

    def _dispatch_resident(self):
        arr, stamps = self._resident
        self._resident = None
        self.state, x6s = self._batch_step(self.state, arr)
        # one lazy (K, 6) device array per batch; flattened on readback
        self.trajectory.append((stamps, x6s))

    def flush(self):
        """Drain the pipeline: wait out the RPC worker / dispatch the
        held-back resident batch, then ship any trailing partial batch
        (padded to the compiled (K, L) shape, dispatching only the real
        rows). Replay costs two tunnel RPCs per `upload_batch` scans instead
        of two per scan — and in async mode they ride a worker thread."""
        self._drain_worker()
        if self._resident is not None:
            self._dispatch_resident()
        if not self._staged:
            return
        if len(self._staged) == self.cfg.upload_batch:
            self._ship_full_batch()
            self._drain_worker()
            if self._resident is not None:
                self._dispatch_resident()
            return
        stamps = [st for _, st in self._staged]
        rows = [b for b, _ in self._staged]
        while len(rows) < self.cfg.upload_batch:
            rows.append(np.zeros_like(rows[0]))
        arr = jnp.asarray(np.stack(rows))
        for k, stamp in enumerate(stamps):
            self.state, out = self._step_row(self.state, arr,
                                             self._row_ids[k])
            self.trajectory.append((stamp, out.x6))
        self._staged = []

    def trajectory_array(self) -> np.ndarray:
        """Sync point: materialize the logged poses as (N, 6) numpy.
        Entries are either (stamp, (6,)) or, from batched replay,
        ((stamps...), (K, 6)) — both flatten in order."""
        self.flush()
        out = []
        for stamp, x6 in self.trajectory:
            a = np.asarray(x6)
            out.extend(a if isinstance(stamp, tuple) else [a])
        if not out:
            return np.zeros((0, 6), np.float32)
        return np.stack(out)

    def pose_matrix(self, x6=None):
        if x6 is None:
            self.flush()  # staged scans must land before reading the pose
        x6 = self.state.x6 if x6 is None else jnp.asarray(x6)
        return np.asarray(lie.pose6_to_matrix(x6))
