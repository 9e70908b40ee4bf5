"""Fused batched replay of the full LVI system — K sensor events per
host↔device round trip.

The interactive `LviSystem` path pays ~4 tunnel RPCs per 100 ms sensor
cycle (scan upload, fusion-glue readback, frame upload, frame readback) —
~25 ms each on the axon attachment (NOTES.md), which caps the MEASURED
full-fusion replay at ~1× real time even though the device programs
themselves run in ~10 ms. This module removes the host from the loop: the
cross-subsystem feedback that previously forced per-event readbacks runs
on device, and whole batches of events ship as ONE upload + ONE deferred
readback:

- exchange 1 (VIS→LIS initial guess): the estimator's nav state lives in
  the device-resident carry and is dead-reckoned to the exact scan stamp
  with the scan's own IMU window (`estimator_node.cpp:218-245` — the
  reference's IMU-rate `imu_propagate`, here propagated on demand inside
  the scan program);
- exchange 2 (LIS→VIS depth): the deskewed-cloud ring, its stamps, and
  the 5 s freshness mask are device state (`feature_tracker_node.cpp:
  273-377`);
- exchange 4 (VIS→LIS loop): BRIEF/BoW detection, PnP verification, the
  stamp→keyframe mapping, and the ICP loop application all run in the
  frame branch (`loop_detector.cpp:12-150` → `mapOptimization.cpp:
  665-741`);
- exchange 5 (failure/reset): the failure counter rides the carry as the
  guess reset id, exactly like the interactive path.

Each staged event is a fixed-shape int16 row: a lidar scan (the
`pack_scan` buffer + the guess/glue IMU windows), a camera frame (the
`pack_frame` buffer), or a no-op pad. `replay_batch_step` is a
`lax.scan` of a 3-way `lax.switch` over the staged rows.

Two documented deviations from the interactive path (both parity-tested
in tests/test_lvi_replay.py):
- the td used to bound the host-packed frame IMU windows refreshes once
  per BATCH readback instead of once per frame (td drifts ~µs/frame; the
  reference's own async pairing has the same class of staleness);
- the depth-cloud ring stores clouds at the guess PROPAGATED to the scan
  stamp instead of the last camera-frame pose — closer to the reference,
  which looks up the TF at cloud time (`feature_tracker_node.cpp:300`).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..core import lie
from ..core.config import CameraIntrinsics
from ..ops import ba, preintegration as pre
from .lio import imu_fusion as fus
from .lio import mapping
from .lio import pipeline as lp
from .loop import loop_detector as ld
from .vio import estimator as est
from .vio import feature_manager as fm
from .vio import feature_tracker as ft
from .vio import frame_step as fs

KIND_SCAN, KIND_FRAME, KIND_NOOP = 0, 1, 2
GUESS_CAP = 64  # IMU samples for the exchange-1 guess propagation
GLUE_CAP = 64  # IMU samples for the fusion-glue window (`_scan_glue`)
_HDR = 8  # int16 header = 4 f32: [kind, do_depth, pad, pad]
_AUX_F32 = 2 * (1 + GUESS_CAP * 7)  # guess + glue windows
_SCAN_OUT = 26  # `_scan_glue` summary
_FRAME_OUT = 21  # `frame_step` summary
OUT_LEN = 1 + _SCAN_OUT + _FRAME_OUT  # [kind, scan26, frame21]


@dataclasses.dataclass(frozen=True)
class ReplayStatics:
    """Everything the fused event program needs at trace time (one hashable
    bundle distilled from `LviConfig`)."""

    lio_caps: mapping.LioCaps
    lio_params: mapping.LioParams
    n_scan: int
    horizon: int
    point_capacity: int
    imu_capacity: int
    min_range: float
    max_range: float
    edge_threshold: float
    surf_threshold: float
    surf_leaf: float
    exact_selection: bool
    fusion: fus.FusionParams
    tracker: ft.TrackerParams
    cam: CameraIntrinsics
    vio_caps: fm.VioCaps
    vio_params: est.VioParams
    ba_cfg: ba.BAConfig
    loop_caps: ld.LoopCaps
    height: int
    width: int
    use_depth: bool
    use_loop: bool
    rolling_shutter_tr: float
    depth_slots: int
    depth_points: int

    @property
    def scan_len(self) -> int:
        return self.point_capacity * 6 + self.imu_capacity * 8 + 48

    @property
    def frame_len(self) -> int:
        return fs._sizes(self.vio_caps, self.height, self.width,
                         self.depth_slots)[3]

    @property
    def row_len(self) -> int:
        return _HDR + max(self.scan_len + 2 * _AUX_F32, self.frame_len)

    @property
    def depth_n(self) -> int:
        """Points copied per accumulated cloud (`_accumulate_depth_cloud`)."""
        return min(self.lio_caps.kf_surf, self.depth_points)


def statics_from(cfg) -> ReplayStatics:
    """Build the static bundle from an `LviConfig` (models/pipeline.py)."""
    lio = cfg.lio
    return ReplayStatics(
        lio_caps=lio.caps, lio_params=lio.params,
        n_scan=lio.n_scan, horizon=lio.horizon,
        point_capacity=lio.point_capacity, imu_capacity=lio.imu_capacity,
        min_range=lio.min_range, max_range=lio.max_range,
        edge_threshold=lio.edge_threshold, surf_threshold=lio.surf_threshold,
        surf_leaf=lio.odometry_surf_leaf,
        exact_selection=lio.exact_loam_selection,
        fusion=cfg.fusion, tracker=cfg.tracker, cam=cfg.camera,
        vio_caps=cfg.vio_caps, vio_params=cfg.vio_params, ba_cfg=cfg.ba,
        loop_caps=cfg.loop_caps,
        height=cfg.image_height, width=cfg.image_width,
        use_depth=cfg.use_lidar_depth, use_loop=cfg.use_loop_detector,
        rolling_shutter_tr=cfg.rolling_shutter_tr,
        depth_slots=cfg.depth_cloud_slots, depth_points=cfg.depth_cloud_points,
    )


class ReplayCarry(NamedTuple):
    """The whole fused system as one device-resident pytree."""

    lio: mapping.LioMapState
    fusion: fus.FusionState
    tracker: ft.TrackerState
    vio: est.VioState
    loop_db: ld.LoopDB
    depth_clouds: jax.Array  # (S, P, 3) VINS-world cloud ring
    depth_valid: jax.Array  # (S, P)
    depth_stamps: jax.Array  # (S,)
    depth_slot: jax.Array  # () int32
    # VIS nav state for exchanges 1/2:
    # [stamp, pos(3), quat(4), vel(3), ba(3), bg(3), reset_id, valid]
    vins: jax.Array  # (19,)


# ------------------------------------------------------------------ packing

def _f32_to_i16(x: np.ndarray) -> np.ndarray:
    return x.astype(np.float32).view(np.int16)


def pack_scan_event(
    st: ReplayStatics,
    scan_buf: np.ndarray,  # from lio.pipeline.pack_scan (odom fields unused)
    do_depth: bool,
    guess: tuple,  # (dts, accs, gyrs, n) window (last frame stamp, t_scan]
    glue: tuple,  # (dts, accs, gyrs, n) window (last scan stamp, t_scan]
) -> np.ndarray:
    row = np.zeros(st.row_len, np.int16)
    hdr = np.array([KIND_SCAN, float(do_depth), 0.0, 0.0], np.float32)
    row[:_HDR] = hdr.view(np.int16)
    row[_HDR : _HDR + st.scan_len] = scan_buf
    aux = np.zeros(_AUX_F32, np.float32)
    for k, (dts, accs, gyrs, n) in enumerate((guess, glue)):
        w = aux[k * (1 + GUESS_CAP * 7) : (k + 1) * (1 + GUESS_CAP * 7)]
        n = min(int(n), GUESS_CAP)
        w[0] = n
        wi = w[1:].reshape(GUESS_CAP, 7)
        if n > 0:
            wi[:n, 0] = dts[:n]
            wi[:n, 1:4] = accs[:n]
            wi[:n, 4:7] = gyrs[:n]
            wi[n:, 1:4] = wi[max(n - 1, 0), 1:4]
            wi[n:, 4:7] = wi[max(n - 1, 0), 4:7]
    a0 = _HDR + st.scan_len
    row[a0 : a0 + 2 * _AUX_F32] = aux.view(np.int16)
    return row


def pack_frame_event(st: ReplayStatics, frame_buf: np.ndarray) -> np.ndarray:
    row = np.zeros(st.row_len, np.int16)
    hdr = np.array([KIND_FRAME, 0.0, 0.0, 0.0], np.float32)
    row[:_HDR] = hdr.view(np.int16)
    row[_HDR : _HDR + st.frame_len] = frame_buf
    return row


def pack_noop_event(st: ReplayStatics) -> np.ndarray:
    row = np.zeros(st.row_len, np.int16)
    hdr = np.array([KIND_NOOP, 0.0, 0.0, 0.0], np.float32)
    row[:_HDR] = hdr.view(np.int16)
    return row


# -------------------------------------------------------------- device step

def _bitcast_f32(x_i16: jax.Array) -> jax.Array:
    return jax.lax.bitcast_convert_type(
        x_i16.reshape(x_i16.shape[0] // 2, 2), jnp.float32
    )


def _unpack_window(aux: jax.Array):
    n = aux[0].astype(jnp.int32)
    w = aux[1:].reshape(GUESS_CAP, 7)
    dts = jnp.where(jnp.arange(GUESS_CAP) < n, w[:, 0], 0.0)
    return n, dts, w[:, 1:4], w[:, 4:7]


def _scan_branch(op, st: ReplayStatics):
    carry, row = op
    scan_pk = row[_HDR : _HDR + st.scan_len]
    hdr = _bitcast_f32(row[:_HDR])
    do_depth = hdr[1] > 0.5
    a0 = _HDR + st.scan_len
    aux = _bitcast_f32(row[a0 : a0 + 2 * _AUX_F32])
    _, gdts, gaccs, ggyrs = _unpack_window(aux[: 1 + GUESS_CAP * 7])
    glue_buf = aux[1 + GUESS_CAP * 7 :]

    # scan stamp from the packed misc block (same layout as lio_full_step)
    P, M = st.point_capacity, st.imu_capacity
    misc = _bitcast_f32(scan_pk[P * 6 + M * 8 :])
    stamp = misc[5]

    # exchange 1: propagate the VIS nav state to the scan stamp (device-side
    # `imu_propagate`; dt==0 padding rows are no-ops)
    vins = carry.vins
    G = jnp.array([0.0, 0.0, -st.fusion.imuGravity], jnp.float32)
    nav0 = pre.NavState(pos=vins[1:4], quat=vins[4:8], vel=vins[8:11],
                        ba=vins[11:14], bg=vins[14:17])
    nav = pre.navstate_predict(nav0, gdts, gaccs, ggyrs, G)
    finite = jnp.all(jnp.isfinite(vins[1:8]))
    odom_avail = (vins[18] > 0.5) & finite
    override = (odom_avail, nav.pos, nav.quat, vins[17].astype(jnp.int32))

    lio2, out = lp.lio_full_step(
        carry.lio, scan_pk, override,
        n_scan=st.n_scan, horizon=st.horizon,
        min_range=st.min_range, max_range=st.max_range,
        edge_threshold=st.edge_threshold, surf_threshold=st.surf_threshold,
        surf_leaf=st.surf_leaf, caps=st.lio_caps, params=st.lio_params,
        point_capacity=st.point_capacity, imu_capacity=st.imu_capacity,
        exact_selection=st.exact_selection,
    )

    from ..models import pipeline as lvip  # late import (cycle-free at runtime)

    fusion2, summary = lvip._scan_glue(
        carry.fusion, out.x6, out.incr_x6, out.degenerate, lio2.kf_count,
        glue_buf, st.fusion,
    )

    # exchange 2: deskewed-cloud accumulation into the device ring
    def acc(args):
        dc, dv, ds, slot = args
        kf = jnp.maximum(lio2.kf_count - 1, 0)
        n = st.depth_n
        pts_l = lio2.kf_surf[kf, :n]
        pv = lio2.kf_surf_valid[kf, :n]
        pts_w = lie.quat_rotate(nav.quat[None], pts_l) + nav.pos[None]
        k = slot % st.depth_slots
        dc = dc.at[k, :n].set(pts_w)
        dv = dv.at[k, :n].set(pv)
        ds = ds.at[k].set(stamp)
        return dc, dv, ds, slot + 1

    dc, dv, ds, slot = jax.lax.cond(
        do_depth & odom_avail, acc, lambda a: a,
        (carry.depth_clouds, carry.depth_valid, carry.depth_stamps,
         carry.depth_slot),
    )

    out_vec = jnp.concatenate([
        jnp.array([KIND_SCAN], jnp.float32), summary,
        jnp.zeros(_FRAME_OUT, jnp.float32),
    ])
    carry2 = carry._replace(
        lio=lio2, fusion=fusion2,
        depth_clouds=dc, depth_valid=dv, depth_stamps=ds, depth_slot=slot,
    )
    return carry2, out_vec


def _loop_points(vio: est.VioState, tout: ft.TrackerOutput):
    """Triangulated world points of the tracked features (the payload the
    pose_graph keyframe carries, `pose_graph_node.cpp:123-267`) — identical
    logic to `LviSystem._loop_detect`."""
    tab = vio.table
    eq = (tab.ids[:, None] == tout.ids[None, :]) & (tab.ids >= 0)[:, None]
    slot_of = jnp.argmax(eq, axis=0)
    has = jnp.any(eq, axis=0)
    inv = tab.inv_depth[slot_of]
    sf = tab.start_frame[slot_of]
    obs0 = jnp.take_along_axis(
        tab.obs[slot_of], sf[:, None, None].repeat(2, -1), axis=1
    )[:, 0]
    depth0 = 1.0 / jnp.maximum(inv, 1e-6)
    pts_c = jnp.concatenate(
        [obs0, jnp.ones((obs0.shape[0], 1))], -1
    ) * depth0[:, None]
    ws = vio.ws
    pts_imu = lie.quat_rotate(ws.qic[None], pts_c) + ws.tic[None]
    pts_w = lie.quat_rotate(ws.Qs[sf], pts_imu) + ws.Ps[sf]
    pvalid = tout.valid & has & (inv > 0)
    return pts_w, pvalid


def _frame_branch(op, st: ReplayStatics):
    carry, row = op
    fbuf = row[_HDR : _HDR + st.frame_len]
    vins = carry.vins
    body_avail = (vins[18] > 0.5) & jnp.all(jnp.isfinite(vins[1:8]))

    tracker2, vio2, tout, depth, summary = fs.frame_step(
        carry.tracker, carry.vio, fbuf,
        carry.depth_clouds, carry.depth_valid,
        st.tracker, st.cam, st.vio_caps, st.vio_params, st.ba_cfg,
        st.height, st.width,
        use_depth=st.use_depth, rolling_shutter_tr=st.rolling_shutter_tr,
        depth_stamps=carry.depth_stamps,
        body_override=(body_avail, vins[1:4], vins[4:8]),
    )

    # frame stamp (same misc layout as pack_frame)
    H, W = st.height, st.width
    M = st.vio_caps.imu_buf
    f = _bitcast_f32(fbuf[H * W // 2 :])
    t = f[M * 7]

    initialized = summary[17] > 0.5
    new_vins = jnp.concatenate([
        t[None], summary[0:16], summary[19:20], jnp.ones(1, jnp.float32),
    ])
    vins2 = jnp.where(initialized, new_vins, carry.vins)

    # exchange 4: visual loop detection + on-device LIS application
    loop_db, lio = carry.loop_db, carry.lio
    if st.use_loop:
        img = jax.lax.bitcast_convert_type(
            fbuf[: H * W // 2].reshape(H, W // 2, 1), jnp.uint8
        ).reshape(H, W).astype(jnp.float32) * (1.0 / 255.0)
        is_kf = summary[18] > 0.5

        def detect(args):
            db, lio_st = args
            pts_w, pvalid = _loop_points(vio2, tout)
            db2, cand = ld.add_and_detect(
                db, img, tout.uv, tout.norm, pts_w, pvalid,
                t, st.loop_caps,
                focal=float(st.cam.gamma1),
                center=jnp.array([st.cam.u0, st.cam.v0], jnp.float32),
            )

            def apply_loop(lio_st):
                t_old = db2.stamps[cand.old_index]
                K = lio_st.kf_time.shape[0]
                kvalid = jnp.arange(K) < lio_st.kf_count
                d_cur = jnp.where(kvalid, jnp.abs(lio_st.kf_time - t), jnp.inf)
                d_old = jnp.where(kvalid, jnp.abs(lio_st.kf_time - t_old), jnp.inf)
                cur = jnp.argmin(d_cur).astype(jnp.int32)
                old = jnp.argmin(d_old).astype(jnp.int32)
                ok = (lio_st.kf_count >= 2) & (jnp.abs(cur - old) >= 2)
                return jax.lax.cond(
                    ok,
                    lambda s: mapping.loop_closure_external(
                        s, cur, old, st.lio_caps, st.lio_params)[0],
                    lambda s: s,
                    lio_st,
                )

            lio2_st = jax.lax.cond(cand.found, apply_loop, lambda s: s, lio_st)
            return db2, lio2_st

        loop_db, lio = jax.lax.cond(
            initialized & is_kf, detect, lambda a: a, (loop_db, lio)
        )

    out_vec = jnp.concatenate([
        jnp.array([KIND_FRAME], jnp.float32), jnp.zeros(_SCAN_OUT, jnp.float32),
        summary,
    ])
    carry2 = carry._replace(
        tracker=tracker2, vio=vio2, loop_db=loop_db, lio=lio, vins=vins2,
    )
    return carry2, out_vec


def _noop_branch(op, st: ReplayStatics):
    carry, _ = op
    return carry, jnp.concatenate([
        jnp.array([KIND_NOOP], jnp.float32),
        jnp.zeros(_SCAN_OUT + _FRAME_OUT, jnp.float32),
    ])


@partial(jax.jit, static_argnames=("st",))
def replay_batch_step(carry: ReplayCarry, rows: jax.Array, st: ReplayStatics):
    """lax.scan of the 3-way event switch over (K, row_len) staged rows.
    Returns (carry', (K, OUT_LEN) per-event summaries)."""

    def body(c, row):
        kind = _bitcast_f32(row[:_HDR])[0].astype(jnp.int32)
        return jax.lax.switch(
            jnp.clip(kind, 0, 2),
            [partial(_scan_branch, st=st),
             partial(_frame_branch, st=st),
             partial(_noop_branch, st=st)],
            (c, row),
        )

    return jax.lax.scan(body, carry, rows)
