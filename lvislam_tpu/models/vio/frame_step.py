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
        depth_on = (misc[2] > 0.5) & jnp.any(fresh)
        d = ft.register_depth(
            tout.norm, tout.valid,
            depth_clouds.reshape(S * depth_clouds.shape[1], 3),
            (depth_valid & fresh[:, None]).reshape(-1),
            misc[3:6], misc[6:10],
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
