"""The fused LVI system — every subsystem wired through the deterministic
bus, reproducing the reference's tight-coupling contract (SURVEY.md §3.5):

1. VIS -> LIS initial guess: the estimator's IMU-rate propagated odometry
   (with failure count as reset id) feeds `updateInitialGuess`
   (`visualization.cpp:96-103` -> `imageProjection.cpp:449-456` ->
   `mapOptimization.cpp:826-861`).
2. LIS -> VIS depth: deskewed clouds accumulate over a 5 s window in the
   VINS world frame and feed `DepthRegister`
   (`imageProjection.cpp:652` -> `feature_tracker_node.cpp:273-377`).
3. LIS -> VIS initialization: IMU-rate fused odometry (TransformFusion) +
   bias/gravity/reset-id side channel seeds `initialStructure`
   (`imuPreintegration.cpp:527-534` -> `initial_alignment.h:79-180`).
4. VIS -> LIS loop candidates: the visual loop detector's verified matches
   feed the LIS ICP loop closure — the channel the reference left dead
   (`/vins/pose_graph/match_frame` vs `/vins/loop/match_frame`,
   SURVEY.md §3.4) is wired and working here.
5. Failure/reset protocol: VINS failure count invalidates LIS guesses;
   IMU-preintegration resets invalidate VINS init frames
   (`estimator.cpp:226-234`, `imuPreintegration.cpp:293-298`).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..core import lie
from ..core.config import CameraIntrinsics
from ..ops import ba, pointcloud as pc
from ..utils.bus import Bus
from ..utils.metrics import MetricsLogger, StageTimer
from .lio import mapping
from .lio.pipeline import LioConfig, LioPipeline
from .lio import imu_fusion as fus
from .vio import estimator as est
from .vio import feature_manager as fm
from .vio import feature_tracker as ft
from .vio import frame_step as fs
from .loop import loop_detector as ld


@partial(jax.jit, static_argnames=("fparams",))
def _scan_glue(
    fusion: fus.FusionState,
    x6, incr_x6, degenerate, kf_count,  # device outputs of the LIO step
    buf,  # (1 + M*7,) f32: [n, (dt, acc3, gyr3) x M] — the one upload
    fparams: fus.FusionParams,
):
    """Post-scan fusion glue as ONE program: LIS incremental odometry ->
    IMU-fusion initialize/correct (`imuPreintegration.cpp:272-456`), plus a
    packed 26-float summary so the host reads everything back in ONE RPC:
    [x6(6), pos(3), quat(4), vel(3), ba(3), bg(3), reset_id, degenerate,
    kf_count, initialized]."""
    n = buf[0].astype(jnp.int32)
    M = (buf.shape[0] - 1) // 7
    imu = buf[1:].reshape(M, 7)
    dts = jnp.where(jnp.arange(M) < n, imu[:, 0], 0.0)
    t_inc, q_inc = mapping._x6_to_tq(incr_x6)
    # lidar->IMU lever arm: compose the lidar correction pose with
    # lidar2Imu = (I, extTrans) so the smoother runs on the IMU-frame pose
    # (`imuPreintegration.cpp:313,402`); no-op for the shipped zero
    # extrinsicTrans
    p_ext = jnp.asarray(fparams.extTrans, jnp.float32)
    t_inc = t_inc + lie.quat_rotate(q_inc[None], p_ext[None])[0]

    def do_init(fu):
        return fus.fusion_initialize(fu, t_inc, q_inc, fparams)

    def do_correct(fu):
        return jax.lax.cond(
            n > 1,
            lambda f2: fus.fusion_correct(
                f2, dts, imu[:, 1:4], imu[:, 4:7], t_inc, q_inc,
                degenerate, fparams,
            ),
            lambda f2: f2,
            fu,
        )

    fusion2 = jax.lax.cond(fusion.initialized, do_correct, do_init, fusion)
    # publish in the lidar frame: imuPose.compose(imu2Lidar)
    # (`imuPreintegration.cpp:509`); identity when extTrans is zero
    pub_pos = fusion2.pos - lie.quat_rotate(fusion2.quat[None], p_ext[None])[0]
    summary = jnp.concatenate([
        x6,
        pub_pos, fusion2.quat, fusion2.vel, fusion2.ba, fusion2.bg,
        fusion2.reset_id.astype(jnp.float32)[None],
        degenerate.astype(jnp.float32)[None],
        kf_count.astype(jnp.float32)[None],
        fusion2.initialized.astype(jnp.float32)[None],
    ])
    return fusion2, summary


def _np_qmul(a, b):
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return np.array([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ])


def _np_qconj(q):
    return np.array([q[0], -q[1], -q[2], -q[3]])


def _np_qrot(q, v):
    w, u = q[0], q[1:4]
    uv = np.cross(u, v)
    return v + 2.0 * (w * uv + np.cross(u, uv))


@dataclasses.dataclass
class LviConfig:
    lio: LioConfig = dataclasses.field(default_factory=LioConfig)
    fusion: fus.FusionParams = dataclasses.field(default_factory=fus.FusionParams)
    vio_caps: fm.VioCaps = dataclasses.field(default_factory=fm.VioCaps)
    vio_params: est.VioParams = dataclasses.field(default_factory=est.VioParams)
    ba: ba.BAConfig = dataclasses.field(default_factory=ba.BAConfig)
    tracker: ft.TrackerParams = dataclasses.field(default_factory=ft.TrackerParams)
    camera: CameraIntrinsics = dataclasses.field(default_factory=CameraIntrinsics)
    loop_caps: ld.LoopCaps = dataclasses.field(default_factory=ld.LoopCaps)
    image_height: int = 240
    image_width: int = 320
    use_lidar_depth: bool = True
    lidar_skip: int = 3  # keep 1-in-(skip+1) clouds for depth (`params_camera.yaml`)
    depth_cloud_slots: int = 12
    depth_cloud_points: int = 4096
    use_loop_detector: bool = True
    # trained BoW vocabulary (`brief.save_vocabulary` file, see
    # scripts/train_vocab.py). "auto" (the default) loads the committed
    # `configs/brief_vocab.npz` when present — the reference loads its
    # trained binary vocabulary at startup the same way
    # (`pose_graph_node.cpp:297-314`). An explicit None opts out to the
    # seeded random-projection vocabulary.
    vocab_path: str | None = "auto"
    # Mapping-rate throttle (`mapOptimization.cpp:312`, params_lidar.yaml
    # `mappingProcessInterval: 0.15`): scans arriving closer than this to
    # the last PROCESSED scan are dropped before the LIS — the reference's
    # own real-time lever (at 10 Hz lidar it maps at 5 Hz). 0 = process
    # every scan (the test default). Deviation from the reference: skipped
    # scans contribute no depth cloud here (the reference's imageProjection
    # still publishes them), so `lidar_skip` counts PROCESSED scans.
    mapping_process_interval: float = 0.0
    # camera-IMU extrinsic
    tic: tuple = (0.0, 0.0, 0.0)
    qic: tuple = (1.0, 0.0, 0.0, 0.0)  # wxyz
    # rolling-shutter readout time per frame, seconds (params_camera.yaml
    # `rolling_shutter_tr`; 0 = global shutter — the shipped rig's value)
    rolling_shutter_tr: float = 0.0
    # IMU-rate fused odometry output stream (the reference's `odometry/imu`,
    # published per IMU sample by TransformFusion: latest map odometry ∘
    # IMU-incremental delta, `imuPreintegration.cpp:22-151,479-549`). When
    # on, every processed scan emits the inter-correction window's
    # per-sample poses into `LviSystem.imu_rate_odom` as
    # (stamp, pos(3), quat_wxyz(4)) rows — host-side numpy propagation of
    # the latest optimized fusion state (zero device RPCs).
    emit_imu_rate_odom: bool = True
    metrics_path: str | None = None  # JSONL per-stage metrics (SURVEY.md §5)
    # debug observability (V16): when set, drop feature/depth overlay PPMs
    # every `debug_every` frames and a match image per visual loop
    # (`utils.debugviz` — the reference's feature_img / depth_image /
    # match_image topics as files)
    debug_dir: str | None = None
    debug_every: int = 10
    # Batched fused replay (models/replay.py): when > 1 and the VIO has
    # initialized, sensor events are staged host-side and shipped K at a
    # time as ONE upload + ONE deferred readback, with every cross-subsystem
    # exchange running device-resident. Removes the ~4 tunnel RPCs x ~25 ms
    # per 100 ms cycle that otherwise cap the measured full-fusion replay
    # at ~1x real time (NOTES.md). Pre-init warmup and failure recovery run
    # the interactive path. Mutually exclusive with pipeline_devices.
    replay_batch: int = 1
    # Pipelined multi-chip placement: (dev_lio, dev_tracker, dev_estimator)
    # jax devices, or None for the fused single-device path. The reference
    # stack is SEVEN asynchronous processes; on a TPU pod the same
    # concurrency comes from placing the three heavy stages on their own
    # chips — JAX async dispatch overlaps the LIO scan program, the tracker
    # program (frame k) and the estimator program (frame k-1), so the
    # system's cycle time is max(stage times) instead of their sum. The
    # estimator runs one frame behind the camera, exactly like the
    # reference's feature queue (`estimator_node.cpp:258-303`).
    pipeline_devices: tuple | None = None


class LviSystem:
    """Single-process, bus-driven LVI SLAM (the 7-executable reference stack
    in one deterministic loop)."""

    def __init__(self, cfg: LviConfig):
        self.cfg = cfg
        self.bus = Bus()
        self.lio = LioPipeline(cfg.lio)
        self.fusion = fus.fusion_init(cfg.fusion)
        self.tracker = ft.tracker_init(cfg.image_height, cfg.image_width, cfg.tracker)
        self.vio = est.vio_init(cfg.vio_caps, cfg.vio_params)
        self.vio = self.vio._replace(ws=self.vio.ws._replace(
            tic=jnp.array(cfg.tic, jnp.float32),
            qic=jnp.array(cfg.qic, jnp.float32),
        ))
        vocab = idf = None
        vocab_path = cfg.vocab_path
        if vocab_path == "auto":  # default: the committed trained vocab
            import pathlib

            p = pathlib.Path(__file__).resolve().parents[2] / "configs" / "brief_vocab.npz"
            vocab_path = str(p) if p.exists() else None
        if vocab_path:  # trained BoW vocabulary (pose_graph_node.cpp:297-314)
            from ..ops import brief as _brief

            vocab, idf = _brief.load_vocabulary(vocab_path)
        self.loop_db = ld.db_init(cfg.loop_caps, vocab=vocab, idf=idf)
        self._dbg_kf_imgs: dict = {}  # debug_dir: slot -> u8 image

        # multi-chip pipelined placement (see LviConfig.pipeline_devices)
        self._pipelined = cfg.pipeline_devices is not None
        self._pending_track = None  # stage-T output awaiting stage E
        self._last_est_time = -1.0  # stamp of the last ESTIMATED frame
        if self._pipelined:
            self._dev_lio, self._dev_trk, self._dev_vio = cfg.pipeline_devices
            self.lio.state = jax.device_put(self.lio.state, self._dev_lio)
            self.fusion = jax.device_put(self.fusion, self._dev_lio)
            self.tracker = jax.device_put(self.tracker, self._dev_trk)
            self.vio = jax.device_put(self.vio, self._dev_vio)
            self.loop_db = jax.device_put(self.loop_db, self._dev_vio)
        else:
            self._dev_lio = self._dev_trk = self._dev_vio = None

        # host-side buffers (raw IMU frame — the VIS consumes these, like
        # the reference's vins_estimator subscribing the raw topic)
        self.imu_times: list[float] = []
        self.imu_gyro: list[np.ndarray] = []
        self.imu_acc: list[np.ndarray] = []
        self.imu_rpy: list[np.ndarray] = []
        # lidar-frame copies (`imuConverter`, utility.h:315-349) — every LIS
        # consumer (fusion glue, lidar-seed propagation) reads these; when
        # the extrinsic is identity they alias the raw lists (zero cost).
        # The deskew window + RPY conversion happens in `pack_scan`.
        from .lio.pipeline import ext_matrix
        self._ext_rot = ext_matrix(cfg.lio.ext_rot)
        if self._ext_rot is None:
            self.imu_gyro_l = self.imu_gyro
            self.imu_acc_l = self.imu_acc
        else:
            self.imu_gyro_l: list[np.ndarray] = []
            self.imu_acc_l: list[np.ndarray] = []
        self.last_image_time = -1.0
        self.last_lidar_time = -1.0
        self._last_map_time = -1e18  # mappingProcessInterval throttle
        self.lidar_counter = 0
        # depth cloud ring (VINS world frame) — DEVICE-resident: consumed
        # only by the fused frame step, so shipping it per frame would be
        # a pointless ~600 KB x 25 ms-latency transfer (NOTES.md)
        # point-dim clamped to kf_surf: both writers (`_accumulate_depth_
        # cloud`, replay `depth_n`) copy at most kf_surf points per slot,
        # so capacity beyond that is permanently-invalid padding that the
        # depth associator would still pay full transform+scatter cost for
        S = cfg.depth_cloud_slots
        P = min(cfg.depth_cloud_points, cfg.lio.caps.kf_surf)
        self.depth_clouds = jnp.zeros((S, P, 3), jnp.float32)
        self.depth_valid = jnp.zeros((S, P), bool)
        if self._pipelined:  # ring lives with the tracker stage
            self.depth_clouds = jax.device_put(self.depth_clouds, self._dev_trk)
            self.depth_valid = jax.device_put(self.depth_valid, self._dev_trk)
        self.depth_stamps = np.full(S, -1e9)
        self.depth_slot = 0
        # per-frame scalars cached from the last frame summary (reading
        # them from device state would be one ~25 ms readback each)
        self._td = 0.0
        self._vio_initialized = False
        # cross-subsystem state
        self.vins_odom = None  # latest VIS imu-propagate (for LIS guess)
        self.last_gps = None  # latest map-frame GPS fix (stamp, pos, noise, use_elev)
        self.lio_odoms: list[tuple] = []  # (stamp, trans, quat) of LIS fused odom
        # IMU-rate fused odometry output (`odometry/imu`): rows of
        # (stamp, pos(3) f32, quat_wxyz(4) f32), appended per IMU sample of
        # every processed scan's inter-correction window
        self.imu_rate_odom: list[tuple] = []
        self._last_fused = None  # fused state + map pose at the last scan
        self.pending_loop = None
        self.trajectory: list[tuple] = []
        self.vio_frames = 0
        self.frame_times: list[float] = []  # VIO window frame stamps

        # batched fused replay (models/replay.py)
        self._replay_active = False
        self._carry = None
        self._replay_statics = None
        self._ev_rows: list = []
        self._ev_meta: list = []
        self._replay_last_frame_t = -1.0
        # RPC worker (see _ship_events)
        self._rp_worker = None
        self._rp_q = None
        self._rp_results = None
        self._rp_exc: BaseException | None = None

        self.metrics = MetricsLogger(cfg.metrics_path)
        self.bus.subscribe("imu", self._on_imu)
        self.bus.subscribe("lidar", lambda t, m: self._timed("lidar", self._on_lidar, t, m))
        img_handler = (
            self._on_image_pipelined if self._pipelined else self._on_image
        )
        self.bus.subscribe("image", lambda t, m: self._timed("image", img_handler, t, m))
        # note: QoS depths (`utility.h:414-470`) only apply in streaming use
        # (feed + run interleaved); a pre-enqueued batch replay must keep
        # every message, so no depth limits are set here.

    def _timed(self, stage, fn, stamp, msg):
        with StageTimer(self.metrics, stage, stamp=stamp):
            fn(stamp, msg)

    # ------------------------------------------------------------------ IMU
    def _on_imu(self, stamp, msg):
        self.imu_times.append(stamp)
        gyro = np.asarray(msg["gyro"], np.float32)
        acc = np.asarray(msg["acc"], np.float32)
        self.imu_gyro.append(gyro)
        self.imu_acc.append(acc)
        if self._ext_rot is not None:  # lidar-frame copies (imuConverter)
            R = self._ext_rot
            self.imu_gyro_l.append((R @ gyro).astype(np.float32))
            self.imu_acc_l.append((R @ acc).astype(np.float32))
        # rpy may be absent OR explicitly None (IMUs without orientation,
        # e.g. MID360 bags) — np.asarray(None) is NaN and would poison the
        # roll/pitch slerp in `_transform_update`; keep a NaN sentinel row
        # and gate on it at scan time instead.
        rpy = msg.get("rpy")
        self.imu_rpy.append(
            np.full(3, np.nan, np.float32) if rpy is None
            else np.asarray(rpy, np.float32)
        )
        # bound buffers to ~10 s at 500 Hz
        if len(self.imu_times) > 5000:
            bufs = [self.imu_times, self.imu_gyro, self.imu_acc, self.imu_rpy]
            if self._ext_rot is not None:
                bufs += [self.imu_gyro_l, self.imu_acc_l]
            for b in bufs:
                del b[:1000]

    def _imu_window(self, t0, t1, cap, interp_end=False, lidar_frame=False):
        """IMU samples in (t0, t1]. With `interp_end`, a synthetic final
        sample is linearly interpolated at exactly t1 from the straddling
        pair — the reference's td-aware boundary handling when pairing IMU
        to a frame at t_img+td (`estimator_node.cpp:333-349`). With
        `lidar_frame`, samples come from the imuConverter-rotated buffers
        (the LIS-side windows, `utility.h:315-349`)."""
        imu_acc = self.imu_acc_l if lidar_frame else self.imu_acc
        imu_gyro = self.imu_gyro_l if lidar_frame else self.imu_gyro
        ts = np.asarray(self.imu_times)
        sel = np.nonzero((ts > t0) & (ts <= t1))[0]
        n = min(len(sel), cap)
        dts = np.zeros(cap, np.float32)
        accs = np.zeros((cap, 3), np.float32)
        gyrs = np.zeros((cap, 3), np.float32)
        if n > 0:
            tt = ts[sel[:n]]
            dts[:n] = np.diff(tt, prepend=t0).astype(np.float32)
            accs[:n] = np.stack([imu_acc[i] for i in sel[:n]])
            gyrs[:n] = np.stack([imu_gyro[i] for i in sel[:n]])
            accs[n:] = accs[n - 1]
            gyrs[n:] = gyrs[n - 1]
            if interp_end and n < cap and tt[n - 1] < t1:
                k_last = sel[n - 1]
                if k_last + 1 < len(ts):
                    # lerp the straddling sample at exactly t1 (`:340-348`)
                    ta, tb = ts[k_last], ts[k_last + 1]
                    w = (t1 - ta) / max(tb - ta, 1e-9)
                    accs[n] = (1 - w) * imu_acc[k_last] + w * imu_acc[k_last + 1]
                    gyrs[n] = (1 - w) * imu_gyro[k_last] + w * imu_gyro[k_last + 1]
                else:
                    accs[n] = imu_acc[k_last]
                    gyrs[n] = imu_gyro[k_last]
                dts[n] = t1 - tt[n - 1]
                n += 1
                accs[n:] = accs[n - 1]
                gyrs[n:] = gyrs[n - 1]
        return dts, accs, gyrs, n

    # ------------------------------------------------- batched fused replay
    def _maybe_activate_replay(self) -> bool:
        """Switch to staged device-resident replay once the VIO is up."""
        if self._replay_active:
            return True
        if (
            self.cfg.replay_batch <= 1
            or self._pipelined
            or not self._vio_initialized
            or self.vins_odom is None
        ):
            return False
        from . import replay as rp

        self.lio.flush()
        if self._replay_statics is None:
            self._replay_statics = rp.statics_from(self.cfg)
        vo = self.vins_odom
        vins = np.concatenate([
            [vo["stamp"]], vo["trans"], vo["quat"], vo["vel"],
            vo["ba"], vo["bg"], [float(vo["reset_id"])], [1.0],
        ]).astype(np.float32)
        self._carry = rp.ReplayCarry(
            lio=self.lio.state, fusion=self.fusion, tracker=self.tracker,
            vio=self.vio, loop_db=self.loop_db,
            depth_clouds=self.depth_clouds, depth_valid=self.depth_valid,
            depth_stamps=jnp.asarray(self.depth_stamps.astype(np.float32)),
            depth_slot=jnp.int32(self.depth_slot),
            vins=jnp.asarray(vins),
        )
        self._replay_last_frame_t = float(vo["stamp"])
        self._replay_active = True
        return True

    def _stage_scan(self, stamp, scan):
        from . import replay as rp
        from .lio.pipeline import pack_scan

        cfg = self.cfg
        self.lio.scan_counter += 1
        do_loop = (
            cfg.lio.loop_closure_enabled
            and self.lio.scan_counter % cfg.lio.loop_every_n_scans == 0
        )
        ts = np.asarray(self.imu_times)
        sel = np.nonzero((ts >= stamp - 0.01) & (ts <= stamp + 0.15))[0]
        irt = (ts[sel] - stamp).astype(np.float32)
        ig = np.stack([self.imu_gyro[i] for i in sel]) if len(sel) else np.zeros((0, 3), np.float32)
        rpy = self.imu_rpy[sel[0]] if len(sel) else None
        if rpy is not None and not np.isfinite(rpy).all():
            rpy = None
        gps = None
        if self.last_gps is not None and abs(self.last_gps["stamp"] - stamp) < 0.2:
            gps = self.last_gps
        scan_buf = pack_scan(
            cfg.lio, dict(scan, stamp=stamp), irt, ig, rpy,
            odom=None, gps=gps, do_loop=do_loop,
        )
        guess = self._imu_window(self._replay_last_frame_t, stamp, rp.GUESS_CAP)
        glue = self._imu_window(self.last_lidar_time, stamp, rp.GLUE_CAP,
                                lidar_frame=True)
        self.last_lidar_time = stamp
        self.lidar_counter += 1
        do_depth = cfg.use_lidar_depth and (
            self.lidar_counter % (cfg.lidar_skip + 1) == 0
        )
        row = rp.pack_scan_event(
            self._replay_statics, scan_buf, do_depth, guess, glue,
        )
        # the glue window rides in the host-side meta so the drain can emit
        # the IMU-rate fused odometry without re-windowing stale buffers
        self._push_event(rp.KIND_SCAN, stamp, row,
                         extra=glue if self.cfg.emit_imu_rate_odom else None)

    def _stage_frame(self, stamp, msg):
        from . import replay as rp
        from .vio import frame_step as fs

        cfg = self.cfg
        td = self._td if cfg.ba.estimate_td else 0.0
        dts = accs = gyrs = np.zeros(0, np.float32)
        n = 0
        if self.last_image_time > 0:
            dts, accs, gyrs, n = self._imu_window(
                self.last_image_time + td, stamp + td, cfg.vio_caps.imu_buf,
                interp_end=True,
            )
        self.last_image_time = stamp
        self.frame_times.append(stamp)
        if len(self.frame_times) > 64:
            del self.frame_times[:32]
        fbuf = fs.pack_frame(
            cfg.vio_caps, np.asarray(msg["image"]), stamp, dts, accs, gyrs, n,
            np.zeros(cfg.depth_cloud_slots, bool),  # device computes freshness
            None, None, None,
        )
        row = rp.pack_frame_event(self._replay_statics, fbuf)
        self._replay_last_frame_t = stamp
        self._push_event(rp.KIND_FRAME, stamp, row)

    def _push_event(self, kind, stamp, row, extra=None):
        self._ev_rows.append(row)
        self._ev_meta.append((kind, stamp, extra))
        if len(self._ev_rows) >= self.cfg.replay_batch:
            self._ship_events()

    def _ship_events(self):
        """Hand the staged batch to the RPC worker thread. The axon tunnel
        BLOCKS the calling thread ~25 ms per committed transfer (upload ~50
        ms for a 1.25 MB event batch, readback ~25 ms — NOTES.md); those
        waits are IO-bound (GIL released), so a single FIFO worker overlaps
        them with the main thread's event packing and with the device's
        execution of the previous batch — the same pattern as the LIO
        replay's async_dispatch (models/lio/pipeline.py)."""
        import queue
        import threading

        from . import replay as rp

        rows, meta = self._ev_rows, self._ev_meta
        self._ev_rows, self._ev_meta = [], []
        while len(rows) < self.cfg.replay_batch:
            rows.append(rp.pack_noop_event(self._replay_statics))
            meta.append((rp.KIND_NOOP, 0.0, None))
        if self._rp_worker is None:
            self._rp_q = queue.Queue()
            self._rp_results = queue.Queue()
            self._rp_worker = threading.Thread(
                target=self._rp_worker_loop, name="lvi-rpc-worker",
                daemon=True)
            self._rp_worker.start()
        self._rp_q.put((rows, meta))
        self._drain_results()

    def _rp_worker_loop(self):
        """Device interaction for enqueued event batches, pipelined one
        batch deep. Owns `self._carry` while the queue is non-empty; the
        main thread touches it only after `_rp_join()`.

        The readback of batch k is DEFERRED until after batch k+1 has been
        uploaded and dispatched: jax dispatch is async, so the blocking
        `np.asarray(outs_k)` then rides under the device's execution of
        k+1, and the next upload rides under k. The previous serial form
        (upload -> compute -> readback per batch) paid
        46 + compute + 25 ms per batch on the axon tunnel — transfers
        gated the measured full-fusion RTF at ~5x even though compute
        alone bounds it at ~9x (NOTES.md round-3 profile)."""
        from . import replay as rp

        pending = []  # [(meta, outs_device)] — depth 1 while items queue
        while True:
            item = self._rp_q.get()
            try:
                if item is None:
                    for m, o in pending:
                        self._rp_results.put((m, np.asarray(o)))
                    return
                if self._rp_exc is not None:
                    continue  # drain remaining items after a failure
                rows, meta = item
                arr = jnp.asarray(np.stack(rows))  # one upload per batch
                self._carry, outs = rp.replay_batch_step(
                    self._carry, arr, self._replay_statics
                )
                pending.append((meta, outs))
                # block on the OLDEST batch only while more work queues;
                # drain fully once the queue is (momentarily) empty so
                # `_rp_join` never returns with readbacks still pending
                while len(pending) > (1 if not self._rp_q.empty() else 0):
                    m, o = pending.pop(0)
                    self._rp_results.put((m, np.asarray(o)))
            except BaseException as e:  # surfaced on the main thread
                self._rp_exc = e
                pending.clear()
            finally:
                self._rp_q.task_done()

    def _rp_join(self):
        """Wait for the worker to go idle; re-raise any worker failure and
        re-point the host mirrors at the live device state."""
        if self._rp_q is not None:
            self._rp_q.join()
        if self._rp_exc is not None:
            exc, self._rp_exc = self._rp_exc, None
            raise exc
        if self._carry is not None:
            self.lio.state = self._carry.lio
            self.fusion = self._carry.fusion
            self.tracker = self._carry.tracker
            self.vio = self._carry.vio
            self.loop_db = self._carry.loop_db
            self.depth_clouds = self._carry.depth_clouds
            self.depth_valid = self._carry.depth_valid

    def _drain_results(self):
        import queue

        if self._rp_results is None:
            return
        while True:
            try:
                meta, o = self._rp_results.get(block=False)
            except queue.Empty:
                return
            if self._process_outputs(meta, o):
                return  # deactivated (drains the rest itself)

    def _process_outputs(self, meta, o) -> bool:
        """Returns True if a VIO failure deactivated the replay."""
        from . import replay as rp

        lost_init = False
        for (kind, stamp, extra), row in zip(meta, o):
            if kind == rp.KIND_SCAN:
                if extra is not None:
                    dts, accs, gyrs, n = extra
                    self._emit_imu_rate(dts, accs, gyrs, n)
                self._update_last_fused(stamp, row[1:27])
                self.trajectory.append((stamp, row[1:7]))
            elif kind == rp.KIND_FRAME:
                self._td = float(row[1 + rp._SCAN_OUT + 16])
                ok = row[1 + rp._SCAN_OUT + 17] > 0.5
                self.vio_frames += 1
                if not ok:
                    lost_init = True
        if lost_init:
            self._deactivate_replay()
        return lost_init

    def _replay_flush(self):
        """Drain staged events + in-flight batches (end of a run() drive)."""
        if not self._replay_active:
            return
        if self._ev_rows:
            self._ship_events()
        if self._rp_q is not None:
            self._rp_join()
        self._drain_results()

    def _deactivate_replay(self):
        """VIO failure during batched replay: hand state back to the
        interactive path (which owns re-initialization, exchange 5)."""
        if not self._replay_active:
            return
        import queue

        self._replay_active = False  # guard first: drain without recursion
        if self._ev_rows:
            self._ship_events()
        if self._rp_q is not None:
            self._rp_join()
        # plain readbacks only — no recursive deactivation
        from . import replay as rp

        while self._rp_results is not None:
            try:
                meta, o = self._rp_results.get(block=False)
            except queue.Empty:
                break
            for (kind, stamp, extra), row in zip(meta, o):
                if kind == rp.KIND_SCAN:
                    if extra is not None:
                        dts, accs, gyrs, n = extra
                        self._emit_imu_rate(dts, accs, gyrs, n)
                    self._update_last_fused(stamp, row[1:27])
                    self.trajectory.append((stamp, row[1:7]))
                elif kind == rp.KIND_FRAME:
                    self._td = float(row[1 + rp._SCAN_OUT + 16])
                    self.vio_frames += 1
        carry = self._carry
        self.depth_stamps = np.asarray(carry.depth_stamps, np.float64)
        self.depth_slot = int(carry.depth_slot)
        vins = np.asarray(carry.vins)
        if vins[18] > 0.5 and np.isfinite(vins[:8]).all():
            self.vins_odom = dict(
                stamp=float(vins[0]), trans=vins[1:4], quat=vins[4:8],
                vel=vins[8:11], ba=vins[11:14], bg=vins[14:17],
                reset_id=int(vins[17]),
            )
        self._vio_initialized = False
        self.lio_odoms = []  # stale fused-odometry stream: force re-seed
        self._carry = None
        self._replay_active = False

    # ---------------------------------------------------------------- LIDAR
    def _on_lidar(self, stamp, scan):
        # mapping-rate throttle (`mapOptimization.cpp:312`) + disorder
        # guard: a duplicated or stale scan (stamp <= last processed) is
        # dropped — the reference's explicit in-disorder drop protocol
        # (`estimator_node.cpp:268-287` for IMU; queues keyed by time for
        # clouds). max(interval, eps) keeps the guard live at interval=0.
        if (stamp - self._last_map_time
                < max(self.cfg.mapping_process_interval, 1e-9)):
            return
        self._last_map_time = stamp
        if self._maybe_activate_replay():
            self._stage_scan(stamp, scan)
            return
        # exchange 1: VIS initial guess for the LIS (incremental, reset-id
        # guarded), propagated from the last VIO frame to the scan stamp
        # with the raw IMU samples — the IMU-rate `imu_propagate` guess
        # (`estimator_node.cpp:218-245`) sampled exactly at scan time,
        # instead of the up-to-100 ms-stale per-camera-frame pose
        odom = None
        if self.vins_odom is not None:
            vo = self.vins_odom
            t_g, q_g = vo["trans"], vo["quat"]
            if stamp > vo["stamp"]:
                dts, accs, gyrs, n = self._imu_window(vo["stamp"], stamp, 64)
                if n > 0 and np.isfinite(t_g).all():
                    # host-side dead-reckoning: this is per-message glue on
                    # a tiny window — device dispatch would cost several
                    # ~25 ms transfer RPCs for microseconds of arithmetic
                    from ..ops import preintegration as _pre
                    G = np.array([0.0, 0.0, -self.cfg.fusion.imuGravity])
                    t_g, q_g, _ = _pre.navstate_predict_np(
                        t_g, q_g, vo["vel"], vo["ba"], vo["bg"],
                        dts[:n], accs[:n], gyrs[:n], G,
                    )
            odom = dict(trans=t_g, quat=q_g, reset_id=vo["reset_id"])
        ts = np.asarray(self.imu_times)
        sel = np.nonzero((ts >= stamp - 0.01) & (ts <= stamp + 0.15))[0]
        irt = (ts[sel] - stamp).astype(np.float32)
        ig = np.stack([self.imu_gyro[i] for i in sel]) if len(sel) else np.zeros((0, 3), np.float32)
        rpy = self.imu_rpy[sel[0]] if len(sel) else None
        if rpy is not None and not np.isfinite(rpy).all():
            rpy = None  # orientation-less IMU: 9-axis init/slerp disabled
        # GPS staleness gate: use the latest fix within 0.2 s of the scan
        # (the reference's gpsQueue pop, `mapOptimization.cpp:1444-1452`)
        gps = None
        if self.last_gps is not None and abs(self.last_gps["stamp"] - stamp) < 0.2:
            gps = self.last_gps
        # Keyframe stamps / loop-closure dt gates run on bus time: override
        # whatever timeline the decoder left in the dict (absolute bag time
        # for livox CustomMsg; PointCloud2 decodes carry no stamp at all).
        scan = dict(scan, stamp=stamp)
        out = self.lio.process_scan(scan, irt, ig, rpy, odom=odom, gps=gps)

        # LIS incremental odometry -> IMU fusion correction (IMU frame),
        # fused into ONE glue program + ONE packed readback (`_scan_glue`);
        # the previous per-field np.asarray bookkeeping paid ~8 transfer
        # RPCs x ~25 ms per scan on the tunnel
        dts, accs, gyrs, n = self._imu_window(self.last_lidar_time, stamp, 64,
                                              lidar_frame=True)
        gbuf = np.zeros(1 + 64 * 7, np.float32)
        gbuf[0] = n
        gi = gbuf[1:].reshape(64, 7)
        gi[:, 0] = dts
        gi[:, 1:4] = accs
        gi[:, 4:7] = gyrs
        self.fusion, summary = _scan_glue(
            self.fusion, out.x6, out.incr_x6, out.degenerate,
            self.lio.state.kf_count, jnp.asarray(gbuf), self.cfg.fusion,
        )
        s = np.asarray(summary)  # the one per-scan readback
        # IMU-rate fused odometry for this inter-correction window, from the
        # PREVIOUS corrected state (TransformFusion) — then refresh the base
        if self.cfg.emit_imu_rate_odom:
            self._emit_imu_rate(dts, accs, gyrs, n)
        self._update_last_fused(stamp, s)
        # exchange 3: fused odometry stream for VIS initialization
        self.lio_odoms.append((
            stamp, s[6:9], s[9:13], s[13:16], s[16:19], s[19:22], int(s[22]),
        ))
        if len(self.lio_odoms) > 200:
            del self.lio_odoms[:100]
        self.last_lidar_time = stamp

        # exchange 2: deskewed-cloud accumulation for the depth register
        self.lidar_counter += 1
        if self.cfg.use_lidar_depth and (
            self.lidar_counter % (self.cfg.lidar_skip + 1) == 0
        ):
            self._accumulate_depth_cloud(stamp, out, kf_count=int(s[24]))
        self.trajectory.append((stamp, s[0:6]))

    def _emit_imu_rate(self, dts, accs, gyrs, n):
        """Emit the IMU-rate fused odometry for one inter-correction window
        (`TransformFusion::imuOdometryHandler`, `imuPreintegration.cpp:
        22-151`, fed by the `imuHandler` predict stream `:479-549`): the
        latest optimized fusion state is dead-reckoned through the window's
        lidar-frame IMU samples and each sample's incremental motion is
        composed onto the latest map odometry —
        pose(t) = T_map(t_k) ∘ (T_fus(t_k)⁻¹ ∘ T_prop(t)). Repropagation on
        bias update is implicit: the propagation base is the CORRECTED
        state, matching the reference's post-correction repropagate
        (`:429-456`)."""
        lf = self._last_fused
        if lf is None or n == 0:
            return
        from ..ops import preintegration as _pre
        from scipy.spatial.transform import Rotation as _R

        G = np.array([0.0, 0.0, -self.cfg.fusion.imuGravity])
        ps, qs, _ = _pre.predict_imu_rate_np(
            lf["pos"], lf["quat"], lf["vel"], lf["ba"], lf["bg"],
            dts[:n], accs[:n], gyrs[:n], G,
        )
        x6 = lf["x6"]
        q_map = np.roll(_R.from_euler("ZYX", [x6[2], x6[1], x6[0]]).as_quat(), 1)
        t_map = np.asarray(x6[3:6], np.float64)
        q0c = _np_qconj(np.asarray(lf["quat"], np.float64)
                        / np.linalg.norm(lf["quat"]))
        p0 = np.asarray(lf["pos"], np.float64)
        times = lf["stamp"] + np.cumsum(np.asarray(dts[:n], np.float64))
        for k in range(n):
            dp = _np_qrot(q0c, ps[k] - p0)
            dq = _np_qmul(q0c, qs[k])
            pos = t_map + _np_qrot(q_map, dp)
            quat = _np_qmul(q_map, dq)
            quat = quat / np.linalg.norm(quat)
            self.imu_rate_odom.append(
                (float(times[k]), pos.astype(np.float32),
                 quat.astype(np.float32))
            )

    def _update_last_fused(self, stamp, s26):
        """Cache the fused state + map pose from a 26-float `_scan_glue`
        summary; clears on fusion reset so the high-rate stream pauses
        until re-initialization (the reference's reset protocol,
        `imuPreintegration.cpp:462-477`)."""
        if s26[25] > 0.5 and np.isfinite(s26[:22]).all():
            self._last_fused = dict(
                stamp=float(stamp), x6=np.asarray(s26[0:6], np.float64),
                pos=s26[6:9], quat=s26[9:13], vel=s26[13:16],
                ba=s26[16:19], bg=s26[19:22],
            )
        else:
            self._last_fused = None

    def _accumulate_depth_cloud(self, stamp, out, kf_count: int | None = None):
        """`lidar_callback` (`feature_tracker_node.cpp:273-377`): downsample
        the deskewed cloud and store it in the VINS world frame — the
        reference looks up the vins_world->vins_body TF, i.e. the cloud is
        placed with the VIS's OWN odometry, not the LIS pose (the two frames
        differ by the map-frame yaw/origin)."""
        if self.vins_odom is None:
            return  # no VINS TF yet (same behavior as a failed TF lookup)
        st = self.lio.state
        if not (np.isfinite(self.vins_odom["trans"]).all()
                and np.isfinite(self.vins_odom["quat"]).all()):
            return
        t = jnp.asarray(self.vins_odom["trans"], jnp.float32)
        q = jnp.asarray(self.vins_odom["quat"], jnp.float32)
        k = self.depth_slot % self.cfg.depth_cloud_slots
        # deskewed-cloud sample: the current scan's surf downsample held in
        # the kf arrays (lidar frame; lidar==body extrinsic here); the
        # transform + ring store run device-side, nothing is read back
        if kf_count is None:
            kf_count = int(st.kf_count)  # one readback (non-fused callers)
        kf = max(kf_count - 1, 0)
        P = self.cfg.depth_cloud_points
        n = min(st.kf_surf.shape[1], P)
        pts_l = st.kf_surf[kf, :n]
        pv = st.kf_surf_valid[kf, :n]
        if self._pipelined:
            # LIO chip -> tracker chip: the scan's surf downsample rides
            # ICI once per kept cloud (the only bulk cross-stage transfer)
            pts_l = jax.device_put(pts_l, self._dev_trk)
            pv = jax.device_put(pv, self._dev_trk)
        pts_w = lie.quat_rotate(q[None], pts_l) + t[None]
        self.depth_clouds = self.depth_clouds.at[k, :n].set(pts_w)
        self.depth_valid = self.depth_valid.at[k, :n].set(pv)
        self.depth_stamps[k] = stamp
        self.depth_slot += 1

    # ---------------------------------------------------------------- IMAGE
    def _on_image(self, stamp, msg):
        """One camera frame = ONE packed upload + ONE fused device program
        + ONE 21-float readback (`models/vio/frame_step.py`); the reference
        spreads this across five callbacks in two processes
        (`feature_tracker_node.cpp:98-270`, `estimator_node.cpp:218-355`)."""
        if self.last_image_time >= 0 and stamp <= self.last_image_time:
            return  # duplicated/stale frame: disorder drop (see _on_lidar)
        if self._maybe_activate_replay():
            self._stage_frame(stamp, msg)
            return
        cfg = self.cfg
        img_np = np.asarray(msg["image"])

        # IMU since last frame up to t_img + td, with the straddling sample
        # interpolated at the exact boundary (`estimator_node.cpp:333-349`);
        # td is the estimator's current estimate, cached from the last
        # frame's summary
        td = self._td if cfg.ba.estimate_td else 0.0
        dts = accs = gyrs = np.zeros(0, np.float32)
        n = 0
        if self.last_image_time > 0:
            dts, accs, gyrs, n = self._imu_window(
                self.last_image_time + td, stamp + td, cfg.vio_caps.imu_buf,
                interp_end=True,
            )
        self.last_image_time = stamp

        self.frame_times.append(stamp)
        if len(self.frame_times) > 64:
            del self.frame_times[:32]
        seed = self._lidar_seed(stamp)

        tf_ok = self.vins_odom is not None and np.isfinite(
            self.vins_odom["trans"]
        ).all()
        buf = fs.pack_frame(
            cfg.vio_caps, img_np, stamp, dts, accs, gyrs, n,
            self.depth_stamps > stamp - 5.0,
            self.vins_odom["trans"] if tf_ok else None,
            self.vins_odom["quat"] if tf_ok else None,
            seed,
        )
        self.tracker, self.vio, tout, depth, summary = fs.frame_step(
            self.tracker, self.vio, jnp.asarray(buf),
            self.depth_clouds, self.depth_valid,
            cfg.tracker, cfg.camera, cfg.vio_caps, cfg.vio_params, cfg.ba,
            cfg.image_height, cfg.image_width,
            use_depth=cfg.use_lidar_depth,
            rolling_shutter_tr=cfg.rolling_shutter_tr,
        )
        s = np.asarray(summary)  # the one per-frame readback
        self._td = float(s[16])
        self._vio_initialized = bool(s[17] > 0.5)
        self.vio_frames += 1

        # exchange 1 publication: VIS odometry for the LIS initial guess —
        # the full nav state so the lidar handler can propagate it to the
        # exact scan stamp (the reference publishes `imu_propagate` at IMU
        # rate, `estimator_node.cpp:218-245`; propagating on demand at scan
        # time is the same signal without 200 Hz of host->device traffic)
        if self._vio_initialized:
            self.vins_odom = dict(
                stamp=float(stamp),
                trans=s[0:3], quat=s[3:7], vel=s[7:10],
                ba=s[10:13], bg=s[13:16],
                reset_id=int(s[19]),
            )

        if cfg.debug_dir and self.vio_frames % cfg.debug_every == 0:
            from ..utils import debugviz as dv

            im = img_np.astype(np.float32)
            if img_np.dtype == np.uint8:
                im = im / 255.0
            dv.save_ppm(
                f"{cfg.debug_dir}/feature_{self.vio_frames:05d}.ppm",
                dv.draw_tracks(im, np.asarray(tout.uv), np.asarray(tout.valid),
                               np.asarray(self.tracker.track_cnt)),
            )
            if cfg.use_lidar_depth:
                dv.save_ppm(
                    f"{cfg.debug_dir}/depth_{self.vio_frames:05d}.ppm",
                    dv.draw_depth_overlay(im, np.asarray(tout.uv),
                                          np.asarray(depth),
                                          np.asarray(tout.valid)),
                )

        # exchange 4: loop detection on VIO keyframes
        if (
            cfg.use_loop_detector
            and self._vio_initialized
            and bool(s[18] > 0.5)
        ):
            im = jnp.asarray(img_np, jnp.float32)
            if img_np.dtype == np.uint8:
                im = im / 255.0
            self._loop_detect(stamp, im, tout)

    def _on_image_pipelined(self, stamp, msg):
        """Multi-chip image path: dispatch stage T (tracker + depth
        registration) for THIS frame on its own device first — JAX dispatch
        is asynchronous, so it executes while the host then runs stage E
        (the estimator) on the PREVIOUS frame's features and blocks on its
        21-float summary. This reproduces the reference's tracker-node ->
        feature-queue -> estimator-node concurrency
        (`feature_tracker_node.cpp:98-270`, `estimator_node.cpp:258-303`):
        the estimator is always one camera period behind the tracker."""
        if self.last_image_time >= 0 and stamp <= self.last_image_time:
            return  # duplicated/stale frame: disorder drop (see _on_lidar)
        cfg = self.cfg
        img_np = np.asarray(msg["image"])
        tf_ok = self.vins_odom is not None and np.isfinite(
            self.vins_odom["trans"]
        ).all()
        tbuf = fs.pack_track(
            img_np, stamp, self.depth_stamps > stamp - 5.0,
            self.vins_odom["trans"] if tf_ok else None,
            self.vins_odom["quat"] if tf_ok else None,
        )
        self.tracker, tout, depth, rt = fs.track_stage(
            self.tracker, jnp.asarray(tbuf),
            self.depth_clouds, self.depth_valid,
            cfg.tracker, cfg.camera, cfg.image_height, cfg.image_width,
            use_depth=cfg.use_lidar_depth,
            rolling_shutter_tr=cfg.rolling_shutter_tr,
        )
        self._estimate_pending()  # stage E for frame k-1, overlapped with T
        self._pending_track = dict(
            stamp=stamp, img=img_np, tout=tout, depth=depth, rt=rt
        )

    def _estimate_pending(self):
        """Stage E: estimator step on the queued stage-T output (one camera
        frame behind, as the reference's feature queue). No-op when the
        queue is empty."""
        pend = self._pending_track
        if pend is None:
            return
        self._pending_track = None
        cfg = self.cfg
        stamp = pend["stamp"]
        td = self._td if cfg.ba.estimate_td else 0.0
        dts = accs = gyrs = np.zeros(0, np.float32)
        n = 0
        if self._last_est_time > 0:
            dts, accs, gyrs, n = self._imu_window(
                self._last_est_time + td, stamp + td, cfg.vio_caps.imu_buf,
                interp_end=True,
            )
        self._last_est_time = stamp
        self.frame_times.append(stamp)
        if len(self.frame_times) > 64:
            del self.frame_times[:32]
        seed = self._lidar_seed(stamp)
        ebuf = fs.pack_estimate(
            cfg.vio_caps, stamp, dts, accs, gyrs, n, seed
        )
        tout, depth, rt = pend["tout"], pend["depth"], pend["rt"]
        feats = (tout.ids, tout.norm, tout.vel, depth, tout.valid, rt,
                 tout.n_tracked, tout.uv)
        if self._dev_vio is not None:
            feats = jax.device_put(feats, self._dev_vio)
        ids, norm, vel, depth_m, valid, rt_m, ntr, uv = feats
        self.vio, summary = fs.estimate_stage(
            self.vio, ids, norm, vel, depth_m, valid, rt_m, ntr,
            jnp.asarray(ebuf), cfg.vio_caps, cfg.vio_params, cfg.ba,
            use_rt=cfg.rolling_shutter_tr > 0,
        )
        s = np.asarray(summary)  # the one per-frame readback
        self._td = float(s[16])
        self._vio_initialized = bool(s[17] > 0.5)
        self.vio_frames += 1

        if self._vio_initialized:
            self.vins_odom = dict(
                stamp=float(stamp),
                trans=s[0:3], quat=s[3:7], vel=s[7:10],
                ba=s[10:13], bg=s[13:16],
                reset_id=int(s[19]),
            )

        if cfg.debug_dir and self.vio_frames % cfg.debug_every == 0:
            from ..utils import debugviz as dv

            im = pend["img"].astype(np.float32)
            if pend["img"].dtype == np.uint8:
                im = im / 255.0
            dv.save_ppm(
                f"{cfg.debug_dir}/feature_{self.vio_frames:05d}.ppm",
                dv.draw_tracks(im, np.asarray(uv), np.asarray(valid),
                               np.asarray(self.tracker.track_cnt)),
            )

        if (
            cfg.use_loop_detector
            and self._vio_initialized
            and bool(s[18] > 0.5)
        ):
            im = jnp.asarray(pend["img"], jnp.float32)
            if pend["img"].dtype == np.uint8:
                im = im / 255.0
            if self._dev_vio is not None:
                im = jax.device_put(im, self._dev_vio)
            tout_m = ft.TrackerOutput(
                ids=ids, uv=uv, norm=norm, vel=vel, valid=valid,
                n_tracked=ntr,
            )
            self._loop_detect(stamp, im, tout_m)

    def _lidar_seed(self, stamp):
        """Build the lidar-seeded init payload (`odometryRegister`,
        `initial_alignment.h:79-180`): window states from the fused LIS
        odometry stream at the VIO frame times. Returns a numpy dict for
        `pack_frame`, or None when unavailable (pre-init only)."""
        W1 = self.cfg.vio_caps.window + 1
        if self._vio_initialized or len(self.lio_odoms) < 3:
            return None
        if len(self.frame_times) < W1:
            return None
        frame_ts = self.frame_times[-W1:]
        odom_ts = np.array([o[0] for o in self.lio_odoms])
        if frame_ts[0] < odom_ts[0]:
            return None
        # per-frame: latest fused odometry before the frame time, propagated
        # to the exact frame stamp with the raw IMU samples (the reference's
        # odometryRegister matches IMU-rate odometry within 50 ms,
        # `initial_alignment.h:94-180`)
        from ..ops import preintegration as _pre
        Ps, Qs, Vs = [], [], []
        reset_ids = set()
        G = np.array([0.0, 0.0, -self.cfg.fusion.imuGravity], np.float32)
        for tf in frame_ts:
            i = int(np.searchsorted(odom_ts, tf, side="right")) - 1
            if i < 0:
                return None
            o = self.lio_odoms[i]
            reset_ids.add(o[6])
            # lidar-frame IMU: lio_odoms states live in the converted frame
            # (the reference's odometry/imu after imuConverter)
            dts, accs, gyrs, n = self._imu_window(o[0], tf, 32,
                                                  lidar_frame=True)
            # host-side dead-reckoning: W+1 tiny windows per pre-init frame
            # would otherwise be a per-frame device-RPC storm on the tunnel
            p, q, v = o[1], o[2], o[3]
            if n > 0:
                p, q, v = _pre.navstate_predict_np(
                    o[1], o[2], o[3], o[4], o[5],
                    dts[:n], accs[:n], gyrs[:n], G,
                )
            Ps.append(np.asarray(p, np.float32))
            Qs.append(np.asarray(q, np.float32))
            Vs.append(np.asarray(v, np.float32))
        if len(reset_ids) != 1:
            return None  # reset happened inside the window (exchange 5)
        o = self.lio_odoms[-1]
        return dict(
            Ps=np.stack(Ps).astype(np.float32),
            Qs=np.stack(Qs).astype(np.float32),
            Vs=np.stack(Vs).astype(np.float32),
            ba=np.asarray(o[4], np.float32),
            bg=np.asarray(o[5], np.float32),
        )

    def _loop_detect(self, stamp, img, tout):
        """Visual loop detection + LIS external loop factor (the repaired
        match_frame channel)."""
        cfg = self.cfg
        # 3D points of tracked features from VIO depths
        tab = self.vio.table
        eq = (tab.ids[:, None] == tout.ids[None, :]) & (tab.ids >= 0)[:, None]
        slot_of = jnp.argmax(eq, axis=0)
        has = jnp.any(eq, axis=0)
        inv = tab.inv_depth[slot_of]
        sf = tab.start_frame[slot_of]
        # gather each matched feature's table row BEFORE indexing its start
        # frame (tab caps F can differ from the tracker's N)
        obs0 = jnp.take_along_axis(
            tab.obs[slot_of], sf[:, None, None].repeat(2, -1), axis=1
        )[:, 0]
        depth0 = 1.0 / jnp.maximum(inv, 1e-6)
        pts_c = jnp.concatenate([obs0, jnp.ones((obs0.shape[0], 1))], -1) * depth0[:, None]
        ws = self.vio.ws
        Pi = ws.Ps[sf]
        Qi = ws.Qs[sf]
        pts_imu = lie.quat_rotate(ws.qic[None], pts_c) + ws.tic[None]
        pts_w = lie.quat_rotate(Qi, pts_imu) + Pi
        pvalid = tout.valid & has & (inv > 0)

        self.loop_db, cand = ld.add_and_detect(
            self.loop_db, img, tout.uv, tout.norm, pts_w, pvalid,
            jnp.float32(stamp), cfg.loop_caps,
            focal=float(cfg.camera.gamma1),
            center=jnp.array([cfg.camera.u0, cfg.camera.v0], jnp.float32),
        )
        if cfg.debug_dir:
            # host-side u8 image ring mirroring the DB slots, for the loop
            # match_image artifact (the DB itself stores descriptors only)
            slot = int(cand.cur_index) % cfg.loop_caps.max_keyframes
            self._dbg_kf_imgs[slot] = np.clip(
                np.asarray(img) * 255.0, 0, 255
            ).astype(np.uint8)
        if bool(np.asarray(cand.found)):
            if cfg.debug_dir:
                from ..utils import debugviz as dv

                old_img = self._dbg_kf_imgs.get(int(cand.old_index))
                if old_img is not None:
                    old_uv = (
                        np.asarray(self.loop_db.kp_norm[int(cand.old_index)])
                        * float(cfg.camera.gamma1)
                        + np.array([cfg.camera.u0, cfg.camera.v0])
                    )
                    dv.save_ppm(
                        f"{cfg.debug_dir}/loop_match_{self.vio_frames:05d}.ppm",
                        dv.draw_matches(
                            old_img, np.asarray(img), old_uv,
                            np.asarray(tout.uv),
                            np.asarray(self.loop_db.kp_valid[int(cand.old_index)])[
                                : tout.uv.shape[0]
                            ],
                        ),
                    )
            t_cur = stamp
            t_old = float(self.loop_db.stamps[int(cand.old_index)])
            self._external_loop(t_cur, t_old)

    def _external_loop(self, t_cur, t_old):
        """Map visual loop times to LIS keyframes and run the ICP verifier
        (`detectLoopClosureExternal` semantics, `mapOptimization.cpp:665-741`
        — functional here, unlike the reference's dead wire)."""
        st = self.lio.state
        times = np.asarray(st.kf_time)
        n = int(st.kf_count)
        if n < 2:
            return
        cur = int(np.argmin(np.abs(times[:n] - t_cur)))
        old = int(np.argmin(np.abs(times[:n] - t_old)))
        if abs(cur - old) < 2:
            return
        self.lio.state, _ = mapping.loop_closure_external(
            st, jnp.int32(cur), jnp.int32(old), self.cfg.lio.caps,
            self.cfg.lio.params,
        )

    # ---------------------------------------------------------------- input
    def feed_imu(self, stamp, gyro, acc, rpy=None):
        self.bus.publish("imu", stamp, dict(gyro=gyro, acc=acc, rpy=rpy))

    def feed_lidar(self, stamp, scan):
        self.bus.publish("lidar", stamp, scan)

    def feed_gps(self, stamp, pos, noise, use_elevation=False):
        """Map-frame GPS fix (the reference's `odometry/gps` input from
        navsat_transform; raw NavSatFix converts via `utils.bag.navsat_to_enu`).
        pos: (3,) meters; noise: (3,) position variances."""
        self.last_gps = dict(
            stamp=float(stamp), pos=np.asarray(pos, np.float32),
            noise=np.asarray(noise, np.float32),
            use_elevation=bool(use_elevation),
        )

    def feed_image(self, stamp, image):
        self.bus.publish("image", stamp, dict(image=image))

    def run(self):
        self.bus.run()
        if self._pipelined:
            self._estimate_pending()  # drain the one-frame pipeline tail
        self._replay_flush()  # drain staged events + deferred readbacks
