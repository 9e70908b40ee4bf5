"""One-dispatch VIO camera-frame step for the fused LVI system.

The reference splits a camera frame across two processes and five+
callbacks (feature_tracker_node `img_callback`, estimator_node
`feature_callback`/`imu_callback`/`process`, `estimator_node.cpp:218-355`,
`feature_tracker_node.cpp:98-270`). A literal port would issue one device
dispatch per stage plus several host readbacks — and this machine's TPU
attachment charges ~25 ms per committed host<->device transfer regardless
of size (NOTES.md), so chatty per-stage dispatch caps the fused system at
~3-4 Hz no matter how fast the kernels are.

This module runs the WHOLE frame as one jitted program on one packed
upload, mirroring the LIO path's `pack_scan`/`lio_full_step`:

    host: pack_frame(...)  -> (L,) int16   [ONE device_put]
    device: frame_step(tracker, vio, buf, depth ring, ...) ->
        new tracker/vio states (device-resident),
        tracker output (device-resident, consumed by loop detection),
        a 21-float summary [ONE readback]

Inside: CLAHE + pyramidal LK + refill (`ft.tracker_step`), lidar depth
registration against the device-resident 5 s cloud ring
(`ft.register_depth`, exchange 2), inter-frame IMU preintegration
(`est.process_imu`) and the sliding-window estimator step
(`est.process_image`) — all fused into one XLA program.

Images travel as uint8 (the reference's cameras are 8-bit; f32 inputs are
quantized at pack time), IMU/seed payloads as f32 bitcast into the same
int16 buffer.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ...core.config import CameraIntrinsics
from ...ops import ba
from . import estimator as est
from . import feature_manager as fm
from . import feature_tracker as ft

_MISC = 12  # t, imu_n, depth_on, body_trans(3), body_quat(4), seed_avail


def _sizes(caps: fm.VioCaps, H: int, W: int, slots: int):
    assert (H * W) % 2 == 0
    M = caps.imu_buf
    W1 = caps.window + 1
    nf = M * 7 + _MISC + slots + W1 * 10 + 6
    return M, W1, nf, H * W // 2 + nf * 2


def pack_frame(
    caps: fm.VioCaps,
    img: np.ndarray,  # (H, W) uint8, or float in [0, 1] (quantized here)
    t: float,
    imu_dts: np.ndarray, imu_accs: np.ndarray, imu_gyrs: np.ndarray,
    imu_n: int,
    depth_fresh: np.ndarray,  # (S,) bool — ring slots younger than 5 s
    body_trans, body_quat,  # vins_world -> vins_body TF (or None)
    seed: dict | None,  # lidar-seeded init payload (numpy) or None
) -> np.ndarray:
    H, W = img.shape
    S = len(depth_fresh)
    M, W1, nf, L = _sizes(caps, H, W, S)
    buf = np.zeros(L, np.int16)
    if img.dtype != np.uint8:
        img = np.clip(np.round(img * 255.0), 0, 255).astype(np.uint8)
    buf[: H * W // 2] = img.reshape(-1).view(np.int16)
    f = buf[H * W // 2 :].view(np.float32)
    imu = f[: M * 7].reshape(M, 7)
    n = min(int(imu_n), M)
    if n > 0:
        imu[:n, 0] = imu_dts[:n]
        imu[:n, 1:4] = imu_accs[:n]
        imu[:n, 4:7] = imu_gyrs[:n]
        imu[n:, 1:4] = imu[max(n - 1, 0), 1:4]
        imu[n:, 4:7] = imu[max(n - 1, 0), 4:7]
    misc = f[M * 7 : M * 7 + _MISC]
    misc[0] = t
    misc[1] = n
    misc[2] = float(body_trans is not None)
    if body_trans is not None:
        misc[3:6] = body_trans
        misc[6:10] = body_quat
    else:
        misc[6] = 1.0
    misc[10] = float(seed is not None)
    f[M * 7 + _MISC : M * 7 + _MISC + S] = depth_fresh.astype(np.float32)
    if seed is not None:
        sd = f[M * 7 + _MISC + S :]
        sd[: W1 * 3] = np.asarray(seed["Ps"], np.float32).reshape(-1)
        sd[W1 * 3 : W1 * 7] = np.asarray(seed["Qs"], np.float32).reshape(-1)
        sd[W1 * 7 : W1 * 10] = np.asarray(seed["Vs"], np.float32).reshape(-1)
        sd[W1 * 10 : W1 * 10 + 3] = np.asarray(seed["ba"], np.float32)
        sd[W1 * 10 + 3 :] = np.asarray(seed["bg"], np.float32)
    return buf


@partial(jax.jit, static_argnames=(
    "tparams", "cam", "caps", "vparams", "cfg", "height", "width",
    "use_depth", "rolling_shutter_tr",
))
def frame_step(
    tracker: ft.TrackerState,
    vio: est.VioState,
    buf: jax.Array,  # (L,) int16 from pack_frame — the one upload
    depth_clouds: jax.Array,  # (S, P, 3) device-resident ring (VINS world)
    depth_valid: jax.Array,  # (S, P) bool
    tparams: ft.TrackerParams,
    cam: CameraIntrinsics,
    caps: fm.VioCaps,
    vparams: est.VioParams,
    cfg: ba.BAConfig,
    height: int,
    width: int,
    use_depth: bool = True,
    rolling_shutter_tr: float = 0.0,
    depth_stamps: jax.Array | None = None,  # (S,) device ring stamps: when
    # given, the 5 s freshness mask is computed HERE instead of host-packed
    # (the fused batched replay keeps the ring fully device-resident)
    body_override=None,  # (avail, trans(3), quat(4)) device-resident
    # vins_world->vins_body TF replacing the packed misc fields (replay.py)
):
    """Returns (tracker', vio', tout, depth, summary(21,) f32).

    summary: [pos(3), quat(4), vel(3), ba(3), bg(3), td, initialized,
    is_keyframe, failure_count, n_tracked]."""
    H, W = height, width
    S = depth_clouds.shape[0]
    M, W1, nf, L = _sizes(caps, H, W, S)

    img = jax.lax.bitcast_convert_type(
        buf[: H * W // 2].reshape(H, W // 2, 1), jnp.uint8
    ).reshape(H, W).astype(jnp.float32) * (1.0 / 255.0)
    f = jax.lax.bitcast_convert_type(
        buf[H * W // 2 :].reshape(nf, 2), jnp.float32
    )
    imu = f[: M * 7].reshape(M, 7)
    misc = f[M * 7 : M * 7 + _MISC]
    t = misc[0]
    imu_n = misc[1].astype(jnp.int32)
    fresh = f[M * 7 + _MISC : M * 7 + _MISC + S] > 0.5
    if depth_stamps is not None:
        fresh = depth_stamps > t - 5.0
    body_avail = misc[2] > 0.5
    body_trans = misc[3:6]
    body_quat = misc[6:10]
    if body_override is not None:
        body_avail, body_trans, body_quat = body_override
    sd = f[M * 7 + _MISC + S :]
    seed = dict(
        available=misc[10] > 0.5,
        Ps=sd[: W1 * 3].reshape(W1, 3),
        Qs=sd[W1 * 3 : W1 * 7].reshape(W1, 4),
        Vs=sd[W1 * 7 : W1 * 10].reshape(W1, 3),
        ba=sd[W1 * 10 : W1 * 10 + 3],
        bg=sd[W1 * 10 + 3 : W1 * 10 + 6],
    )

    # ---- feature tracking (CLAHE + LK + F-RANSAC + refill) ----
    tracker2, tout = ft.tracker_step(tracker, img, t, tparams, cam)

    # ---- exchange 2: lidar depth channel ----
    depth = jnp.full((tparams.max_cnt,), -1.0, jnp.float32)
    if use_depth:
        depth_on = body_avail & jnp.any(fresh)
        d = ft.register_depth(
            tout.norm, tout.valid,
            depth_clouds.reshape(S * depth_clouds.shape[1], 3),
            (depth_valid & fresh[:, None]).reshape(-1),
            body_trans, body_quat,
        )
        depth = jnp.where(depth_on, d, depth)

    # ---- inter-frame IMU (window already td-aligned by the host) ----
    # zero-dt padding makes the extra samples no-ops, but a fully empty
    # window must not preintegrate at all (first frame / stream gap)
    imu_dts = jnp.where(jnp.arange(M) < imu_n, imu[:, 0], 0.0)
    vio2 = jax.lax.cond(
        imu_n > 0,
        lambda v: est.process_imu(
            v, imu_dts, imu[:, 1:4], imu[:, 4:7], caps, vparams
        ),
        lambda v: v,
        vio,
    )

    # ---- estimator step ----
    rt = None
    if rolling_shutter_tr > 0:
        rt = tout.uv[:, 1] * (rolling_shutter_tr / H)
    vio3, vout = est.process_image(
        vio2, tout.ids, tout.norm, tout.vel, depth, tout.valid, seed,
        caps, vparams, cfg, rt=rt,
    )

    j = jnp.minimum(vio3.frame_count, caps.window)
    summary = jnp.concatenate([
        vout["pos"], vout["quat"], vout["vel"],
        vio3.ws.Bas[j], vio3.ws.Bgs[j],
        vio3.ws.td[None],
        vout["initialized"].astype(jnp.float32)[None],
        vout["is_keyframe"].astype(jnp.float32)[None],
        vio3.failure_count.astype(jnp.float32)[None],
        tout.n_tracked.astype(jnp.float32)[None],
    ])
    return tracker2, vio3, tout, depth, summary


# ---------------------------------------------------------------------------
# Pipelined two-stage variant (multi-chip deployment)
# ---------------------------------------------------------------------------
# The reference runs the tracker and the estimator as SEPARATE PROCESSES
# joined by a feature queue (`feature_tracker_node.cpp:98-270` publishes,
# `estimator_node.cpp:258-303` consumes asynchronously) — the estimator is
# always one publish behind the camera. These two stages reproduce that
# split so a multi-chip deployment can place the tracker and the estimator
# (and the LIO step) on different devices and overlap them via JAX's async
# dispatch: stage T tracks frame k while stage E solves frame k-1.

_MISC_T = 10  # t, tf_ok, body_trans(3), body_quat(4), pad


def pack_track(
    img: np.ndarray,  # (H, W) uint8 or float in [0, 1]
    t: float,
    depth_fresh: np.ndarray,  # (S,) bool
    body_trans, body_quat,  # vins_world -> vins_body TF (or None)
) -> np.ndarray:
    H, W = img.shape
    S = len(depth_fresh)
    nf = _MISC_T + S
    buf = np.zeros(H * W // 2 + nf * 2, np.int16)
    if img.dtype != np.uint8:
        img = np.clip(np.round(img * 255.0), 0, 255).astype(np.uint8)
    buf[: H * W // 2] = img.reshape(-1).view(np.int16)
    f = buf[H * W // 2 :].view(np.float32)
    f[0] = t
    f[1] = float(body_trans is not None)
    if body_trans is not None:
        f[2:5] = body_trans
        f[5:9] = body_quat
    else:
        f[5] = 1.0
    f[_MISC_T : _MISC_T + S] = depth_fresh.astype(np.float32)
    return buf


@partial(jax.jit, static_argnames=(
    "tparams", "cam", "height", "width", "use_depth", "rolling_shutter_tr",
))
def track_stage(
    tracker: ft.TrackerState,
    buf: jax.Array,  # (L,) int16 from pack_track
    depth_clouds: jax.Array,
    depth_valid: jax.Array,
    tparams: ft.TrackerParams,
    cam: CameraIntrinsics,
    height: int,
    width: int,
    use_depth: bool = True,
    rolling_shutter_tr: float = 0.0,
):
    """Tracker + depth registration only (the feature_tracker node).
    Returns (tracker', tout, depth, rt) — all device-resident; the host
    forwards them to `estimate_stage` (device_put when stages live on
    different chips)."""
    H, W = height, width
    S = depth_clouds.shape[0]
    nf = _MISC_T + S
    img = jax.lax.bitcast_convert_type(
        buf[: H * W // 2].reshape(H, W // 2, 1), jnp.uint8
    ).reshape(H, W).astype(jnp.float32) * (1.0 / 255.0)
    f = jax.lax.bitcast_convert_type(
        buf[H * W // 2 :].reshape(nf, 2), jnp.float32
    )
    t = f[0]
    fresh = f[_MISC_T : _MISC_T + S] > 0.5

    tracker2, tout = ft.tracker_step(tracker, img, t, tparams, cam)

    depth = jnp.full((tparams.max_cnt,), -1.0, jnp.float32)
    if use_depth:
        depth_on = (f[1] > 0.5) & jnp.any(fresh)
        d = ft.register_depth(
            tout.norm, tout.valid,
            depth_clouds.reshape(S * depth_clouds.shape[1], 3),
            (depth_valid & fresh[:, None]).reshape(-1),
            f[2:5], f[5:9],
        )
        depth = jnp.where(depth_on, d, depth)

    rt = tout.uv[:, 1] * (rolling_shutter_tr / H) if rolling_shutter_tr > 0 \
        else jnp.zeros((tparams.max_cnt,), jnp.float32)
    return tracker2, tout, depth, rt


def pack_estimate(
    caps: fm.VioCaps,
    t: float,
    imu_dts: np.ndarray, imu_accs: np.ndarray, imu_gyrs: np.ndarray,
    imu_n: int,
    seed: dict | None,
) -> np.ndarray:
    M, W1 = caps.imu_buf, caps.window + 1
    f = np.zeros(M * 7 + 3 + W1 * 10 + 6, np.float32)
    imu = f[: M * 7].reshape(M, 7)
    n = min(int(imu_n), M)
    if n > 0:
        imu[:n, 0] = imu_dts[:n]
        imu[:n, 1:4] = imu_accs[:n]
        imu[:n, 4:7] = imu_gyrs[:n]
        imu[n:, 1:4] = imu[max(n - 1, 0), 1:4]
        imu[n:, 4:7] = imu[max(n - 1, 0), 4:7]
    f[M * 7] = t
    f[M * 7 + 1] = n
    f[M * 7 + 2] = float(seed is not None)
    if seed is not None:
        sd = f[M * 7 + 3 :]
        sd[: W1 * 3] = np.asarray(seed["Ps"], np.float32).reshape(-1)
        sd[W1 * 3 : W1 * 7] = np.asarray(seed["Qs"], np.float32).reshape(-1)
        sd[W1 * 7 : W1 * 10] = np.asarray(seed["Vs"], np.float32).reshape(-1)
        sd[W1 * 10 : W1 * 10 + 3] = np.asarray(seed["ba"], np.float32)
        sd[W1 * 10 + 3 :] = np.asarray(seed["bg"], np.float32)
    return f


@partial(jax.jit, static_argnames=("caps", "vparams", "cfg", "use_rt"))
def estimate_stage(
    vio: est.VioState,
    ids: jax.Array,
    norm: jax.Array,
    vel: jax.Array,
    depth: jax.Array,
    valid: jax.Array,
    rt: jax.Array,
    n_tracked: jax.Array,
    ebuf: jax.Array,  # (L,) f32 from pack_estimate
    caps: fm.VioCaps,
    vparams: est.VioParams,
    cfg: ba.BAConfig,
    use_rt: bool = False,
):
    """IMU preintegration + sliding-window estimator (the estimator node),
    consuming the features `track_stage` produced for the SAME frame —
    typically dispatched one camera period later, as the reference's
    feature queue does. Returns (vio', summary(21,)) with the same summary
    layout as `frame_step`."""
    M, W1 = caps.imu_buf, caps.window + 1
    imu = ebuf[: M * 7].reshape(M, 7)
    # ebuf[M*7] is the frame stamp (kept in the layout for debugging;
    # the estimator itself is stamp-free — frames are ordinal)
    imu_n = ebuf[M * 7 + 1].astype(jnp.int32)
    sd = ebuf[M * 7 + 3 :]
    seed = dict(
        available=ebuf[M * 7 + 2] > 0.5,
        Ps=sd[: W1 * 3].reshape(W1, 3),
        Qs=sd[W1 * 3 : W1 * 7].reshape(W1, 4),
        Vs=sd[W1 * 7 : W1 * 10].reshape(W1, 3),
        ba=sd[W1 * 10 : W1 * 10 + 3],
        bg=sd[W1 * 10 + 3 : W1 * 10 + 6],
    )
    imu_dts = jnp.where(jnp.arange(M) < imu_n, imu[:, 0], 0.0)
    vio2 = jax.lax.cond(
        imu_n > 0,
        lambda v: est.process_imu(
            v, imu_dts, imu[:, 1:4], imu[:, 4:7], caps, vparams
        ),
        lambda v: v,
        vio,
    )
    vio3, vout = est.process_image(
        vio2, ids, norm, vel, depth, valid, seed,
        caps, vparams, cfg, rt=rt if use_rt else None,
    )
    j = jnp.minimum(vio3.frame_count, caps.window)
    summary = jnp.concatenate([
        vout["pos"], vout["quat"], vout["vel"],
        vio3.ws.Bas[j], vio3.ws.Bgs[j],
        vio3.ws.td[None],
        vout["initialized"].astype(jnp.float32)[None],
        vout["is_keyframe"].astype(jnp.float32)[None],
        vio3.failure_count.astype(jnp.float32)[None],
        n_tracked.astype(jnp.float32)[None],
    ])
    return vio3, summary
