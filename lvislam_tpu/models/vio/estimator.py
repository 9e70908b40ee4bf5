"""Sliding-window visual-inertial estimator — the `Estimator` +
`estimator_node` equivalent (`vins_estimator/src/estimator.{h,cpp}`,
`estimator_node.cpp`).

Window state, preintegrations, feature table, and the marginalization prior
are one pytree; each camera frame drives:

- `process_imu`: midpoint propagation of the window-end state + per-frame
  preintegration push_back (`estimator.cpp:82-116`);
- `process_image`: feature-table insert + parallax keyframe flag
  (`:118-212`), initialization (lidar-odometry-seeded path,
  `initialStructure` path A `:215-271`), then BA (`ops.ba.solve`) +
  marginalization + window slide;
- `failure_detection` (`:648-693`) as a pure predicate with clearState
  reboot semantics.

Host wrapper `VioEstimator` carries the IMU buffering / td-aware pairing of
`getMeasurements` (`estimator_node.cpp:179-216`).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ...core import lie
from ...ops import ba, preintegration as pre
from . import feature_manager as fm
from . import initializer as vinit


@dataclasses.dataclass(frozen=True)
class VioParams:
    # reference `params_camera.yaml` noise ("The more accurate parameters
    # you provide, the worse performance" — VINS deliberately runs with
    # inflated IMU noise; it also keeps the whitened system conditioned)
    acc_n: float = 0.4
    gyr_n: float = 0.15
    acc_w: float = 6.4e-3
    gyr_w: float = 3.6e-3
    g_norm: float = 9.81
    min_parallax: float = 10.0 / 460.0
    init_depth: float = 5.0
    # failure thresholds (`estimator.cpp:648-693`)
    ba_threshold: float = 2.5
    bg_threshold: float = 1.0
    max_v_norm: float = 30.0
    jump_t: float = 5.0
    jump_z: float = 1.0
    # enable the visual-SfM bootstrap fallback (`initialStructure` path B) —
    # static flag: tracing the SfM costs compile time, so lidar-only rigs
    # can turn it off
    use_visual_init: bool = True
    # ESTIMATE_EXTRINSIC=2 semantics (`estimator.cpp:160-186`): bootstrap the
    # camera-IMU rotation online via hand-eye calibration; initialization is
    # blocked until it converges (`:219`). Static flag (traces the epipolar
    # RANSAC + hand-eye solve per frame when on).
    estimate_extrinsic_rotation: bool = False
    ex_min_pairs: int = 10  # WINDOW_SIZE pairs before accepting (`:56`)


class VioState(NamedTuple):
    ws: ba.WindowState
    table: fm.FeatureTable
    pints: pre.PreintState  # stacked (W,) preintegrations between frames
    imu_bufs: tuple  # (dts (W, M), accs (W, M, 3), gyrs (W, M, 3)) raw buffers
    prior: ba.Prior
    frame_count: jax.Array  # () frames currently in window (<= W+1)
    frame_valid: jax.Array  # (W+1,)
    initialized: jax.Array  # () bool — INITIAL vs NON_LINEAR
    failed: jax.Array  # () bool (failure this step)
    failure_count: jax.Array  # () int32 — doubles as the reset-id the LIS
    # guess channel checks (exchange 5): a reboot invalidates stale guesses
    td0: jax.Array  # () reference td
    last_marg_old: jax.Array  # () bool
    # previous frame's post-solve newest pose for the jump checks
    # (`estimator.cpp:671-681` last_P; updated at `:205-211`)
    last_P: jax.Array  # (3,)
    last_P_ok: jax.Array  # () bool
    # hand-eye extrinsic-rotation bootstrap ring (ESTIMATE_EXTRINSIC=2)
    ex_qcam: jax.Array  # (E, 4)
    ex_qimu: jax.Array  # (E, 4)
    ex_valid: jax.Array  # (E,)
    ex_count: jax.Array  # () int32
    ex_q: jax.Array  # (4,) running q_ic estimate
    ric_ok: jax.Array  # () bool — extrinsic rotation known/converged


def _empty_pints(W: int, M: int, dtype=jnp.float32):
    one = pre.preint_init(jnp.zeros(3, dtype), jnp.zeros(3, dtype),
                          jnp.zeros(3, dtype), jnp.zeros(3, dtype))
    return jax.tree.map(lambda x: jnp.broadcast_to(x[None], (W,) + x.shape), one)


def vio_init(caps: fm.VioCaps, params: VioParams, dtype=jnp.float32) -> VioState:
    W1 = caps.window + 1
    ws = ba.WindowState(
        Ps=jnp.zeros((W1, 3), dtype),
        Qs=jnp.tile(lie.quat_identity(dtype), (W1, 1)),
        Vs=jnp.zeros((W1, 3), dtype),
        Bas=jnp.zeros((W1, 3), dtype),
        Bgs=jnp.zeros((W1, 3), dtype),
        tic=jnp.zeros(3, dtype),
        qic=lie.quat_identity(dtype),
        td=jnp.zeros((), dtype),
    )
    cfg = ba.BAConfig(window=caps.window, max_features=caps.max_features)
    M = caps.imu_buf
    return VioState(
        ws=ws,
        table=fm.table_init(caps, dtype),
        pints=_empty_pints(caps.window, M, dtype),
        imu_bufs=(
            jnp.zeros((caps.window, M), dtype),
            jnp.zeros((caps.window, M, 3), dtype),
            jnp.zeros((caps.window, M, 3), dtype),
        ),
        prior=ba.empty_prior(cfg, dtype),
        frame_count=jnp.int32(0),
        frame_valid=jnp.zeros(W1, bool),
        initialized=jnp.array(False),
        failed=jnp.array(False),
        failure_count=jnp.int32(0),
        td0=jnp.zeros((), dtype),
        last_marg_old=jnp.array(True),
        last_P=jnp.zeros(3, dtype),
        last_P_ok=jnp.array(False),
        ex_qcam=jnp.tile(lie.quat_identity(dtype), (caps.ex_pairs, 1)),
        ex_qimu=jnp.tile(lie.quat_identity(dtype), (caps.ex_pairs, 1)),
        ex_valid=jnp.zeros(caps.ex_pairs, bool),
        ex_count=jnp.int32(0),
        ex_q=lie.quat_identity(dtype),
        ric_ok=jnp.array(not params.estimate_extrinsic_rotation),
    )


def _clear_state(state: VioState, caps: fm.VioCaps, params: VioParams) -> VioState:
    """`clearState` + `setParameter` reboot (`estimator.cpp:22-80,188-196`):
    full re-initialization keeping the extrinsic/td calibration. The caller
    increments `failure_count` — which is also the reset-id consumed by the
    LIS guess channel, so downstream consumers drop stale odometry."""
    fresh = vio_init(caps, params, state.ws.Ps.dtype)
    return fresh._replace(
        ws=fresh.ws._replace(tic=state.ws.tic, qic=state.ws.qic, td=state.ws.td),
        td0=state.td0,
        failure_count=state.failure_count,
        failed=jnp.array(True),
    )


@partial(jax.jit, static_argnames=("caps", "params"))
def process_imu(
    state: VioState,
    dts: jax.Array,  # (M,) padded with zeros
    accs: jax.Array,  # (M, 3)
    gyrs: jax.Array,
    caps: fm.VioCaps,
    params: VioParams,
):
    """`processIMU` for the whole inter-frame buffer (`estimator.cpp:82-116`):
    preintegrate into slot frame_count-1 and propagate the newest state."""
    noise = pre.ImuNoise.create(params.acc_n, params.gyr_n, params.acc_w, params.gyr_w)
    k = jnp.clip(state.frame_count - 1, 0, caps.window - 1)
    j = jnp.clip(state.frame_count, 0, caps.window)

    pint0 = pre.preint_init(accs[0], gyrs[0], state.ws.Bas[j], state.ws.Bgs[j])
    pint = pre.preintegrate(pint0, dts, accs, gyrs, noise)
    pints = jax.tree.map(
        lambda buf, x: buf.at[k].set(x), state.pints, pint
    )
    d, a, g = state.imu_bufs
    imu_bufs = (d.at[k].set(dts), a.at[k].set(accs), g.at[k].set(gyrs))

    # propagate newest window state (world frame, gravity down)
    G = jnp.array([0.0, 0.0, -params.g_norm], accs.dtype)
    nav = pre.NavState(
        pos=state.ws.Ps[j], quat=state.ws.Qs[j], vel=state.ws.Vs[j],
        ba=state.ws.Bas[j], bg=state.ws.Bgs[j],
    )
    nav = pre.navstate_predict(nav, dts, accs, gyrs, G)
    ws = state.ws._replace(
        Ps=state.ws.Ps.at[j].set(nav.pos),
        Qs=state.ws.Qs.at[j].set(nav.quat),
        Vs=state.ws.Vs.at[j].set(nav.vel),
    )
    return state._replace(ws=ws, pints=pints, imu_bufs=imu_bufs)


def _slide_window(state: VioState, marg_old, caps: fm.VioCaps, cfg: ba.BAConfig):
    """`slideWindow` (`estimator.cpp:979-1099`) for a full window."""
    W = caps.window

    def do_old(state):
        ws = state.ws
        # camera poses of old frame 0 and new frame 0 for depth re-anchor
        t0, q0 = lie.se3_compose(ws.Ps[0], ws.Qs[0], ws.tic, ws.qic)
        t1, q1 = lie.se3_compose(ws.Ps[1], ws.Qs[1], ws.tic, ws.qic)
        table = fm.slide_old(
            state.table, t0, lie.quat_to_matrix(q0), t1, lie.quat_to_matrix(q1),
            caps,
        )
        roll = lambda x: jnp.concatenate([x[1:], x[-1:]], axis=0)
        ws = ws._replace(
            Ps=roll(ws.Ps), Qs=roll(ws.Qs), Vs=roll(ws.Vs),
            Bas=roll(ws.Bas), Bgs=roll(ws.Bgs),
        )
        pints = jax.tree.map(lambda x: jnp.concatenate([x[1:], x[-1:]], 0), state.pints)
        bufs = tuple(jnp.concatenate([b[1:], b[-1:]], 0) for b in state.imu_bufs)
        return state._replace(ws=ws, table=table, pints=pints, imu_bufs=bufs)

    def do_new(state):
        ws = state.ws
        table = fm.slide_new(state.table, caps)
        # frame W replaces W-1; the two trailing preintegrations merge
        # (`slideWindowNew` pushes the removed frame's samples into the
        # previous integration, `estimator.cpp:992-1001`)
        put = lambda x: x.at[W - 1].set(x[W])
        ws = ws._replace(
            Ps=put(ws.Ps), Qs=put(ws.Qs), Vs=put(ws.Vs),
            Bas=put(ws.Bas), Bgs=put(ws.Bgs),
        )
        a = jax.tree.map(lambda x: x[W - 2], state.pints)
        b = jax.tree.map(lambda x: x[W - 1], state.pints)
        merged = pre.preint_compose(a, b)
        pints = jax.tree.map(
            lambda buf, m: buf.at[W - 2].set(m), state.pints, merged
        )
        return state._replace(ws=ws, table=table, pints=pints)

    return jax.lax.cond(marg_old, do_old, do_new, state)


@partial(jax.jit, static_argnames=("caps", "params", "cfg"))
def process_image(
    state: VioState,
    ids: jax.Array,  # (N,)
    norm: jax.Array,  # (N, 2)
    vel: jax.Array,  # (N, 2)
    depth: jax.Array,  # (N,) lidar depth channel
    valid: jax.Array,  # (N,)
    lidar_odom: dict,  # seeded init: {available, pos, quat, vel, ba, bg}
    caps: fm.VioCaps,
    params: VioParams,
    cfg: ba.BAConfig,
    rt: jax.Array | None = None,  # (N,) rolling-shutter row times, seconds
):
    """`processImage` (`estimator.cpp:118-212`). Returns (state, outputs)."""
    W = caps.window
    fi = jnp.minimum(state.frame_count, W)

    table, parallax_kf = fm.add_frame(
        state.table, fi, ids, norm, vel, depth, valid, caps,
        min_parallax=params.min_parallax, in_rt=rt,
    )
    # lidar info forces MARGIN_OLD during init (`estimator.cpp:127-128`)
    marg_old = parallax_kf | (~state.initialized)
    state = state._replace(table=table, frame_valid=state.frame_valid.at[fi].set(True))

    window_full = state.frame_count >= W

    # ESTIMATE_EXTRINSIC=2: hand-eye rotation bootstrap (`estimator.cpp:
    # 160-186`) — epipolar rotation between the two newest frames paired
    # with the newest preintegration delta_q, pushed into a ring and
    # re-solved each frame until excitation suffices
    if params.estimate_extrinsic_rotation:
        from ...ops import handeye, triangulate

        def calib(state):
            tb = state.table
            prev = jnp.maximum(fi - 1, 0)
            both = (
                (tb.ids >= 0)
                & jnp.take_along_axis(tb.obs_valid, prev[None, None], 1)[:, 0]
                & jnp.take_along_axis(tb.obs_valid, fi[None, None], 1)[:, 0]
            )
            x0 = jnp.take_along_axis(tb.obs, prev[None, None, None].repeat(2, -1), 1)[:, 0]
            x1 = jnp.take_along_axis(tb.obs, fi[None, None, None].repeat(2, -1), 1)[:, 0]
            rel = triangulate.relative_pose(x0, x1, both, n_hyp=128)
            # RelPose.R maps prev->cur; the hand-eye wants the same sense as
            # preint delta_q (orientation of the NEW frame in the old) -> Rᵀ
            q_cam = lie.matrix_to_quat(rel.R.T)
            k = jnp.clip(state.frame_count - 1, 0, W - 1)
            q_imu = jax.tree.map(lambda x: x[k], state.pints).delta_q
            slot = state.ex_count % caps.ex_pairs
            use = rel.ok & (state.frame_count >= 1)

            def push(state):
                return state._replace(
                    ex_qcam=state.ex_qcam.at[slot].set(q_cam),
                    ex_qimu=state.ex_qimu.at[slot].set(q_imu),
                    ex_valid=state.ex_valid.at[slot].set(True),
                    ex_count=state.ex_count + 1,
                )

            state = jax.lax.cond(use, push, lambda s: s, state)
            res = handeye.calibrate_rotation(
                state.ex_qcam, state.ex_qimu, state.ex_valid, state.ex_q,
                min_pairs=params.ex_min_pairs,
            )
            state = state._replace(ex_q=res.q_ic)

            def accept(state):
                # switch to refine mode: fix qic; BA can keep polishing it
                return state._replace(
                    ws=state.ws._replace(qic=res.q_ic), ric_ok=jnp.array(True)
                )

            return jax.lax.cond(res.ok, accept, lambda s: s, state)

        state = jax.lax.cond(state.ric_ok, lambda s: s, calib, state)

    def try_initialize(state):
        """Lidar-odometry-seeded initialization (`initialStructure` path A,
        `estimator.cpp:215-271`): seed window states from lidar odometry and
        triangulate."""

        def do_init(state):
            ws = state.ws._replace(
                Ps=lidar_odom["Ps"], Qs=lidar_odom["Qs"], Vs=lidar_odom["Vs"],
                Bas=jnp.tile(lidar_odom["ba"][None], (W + 1, 1)),
                Bgs=jnp.tile(lidar_odom["bg"][None], (W + 1, 1)),
            )
            # repropagate all preintegrations with the seeded biases
            noise = pre.ImuNoise.create(
                params.acc_n, params.gyr_n, params.acc_w, params.gyr_w
            )
            d, a, g = state.imu_bufs

            def reprop(k):
                fresh = pre.preint_init(a[k, 0], g[k, 0], lidar_odom["ba"], lidar_odom["bg"])
                return pre.preintegrate(fresh, d[k], a[k], g[k], noise)

            pints = jax.vmap(reprop)(jnp.arange(W))
            table = fm.triangulate_all(
                state.table._replace(inv_depth=jnp.where(
                    state.table.lidar_flag, state.table.inv_depth, -1.0
                )),
                ws.Ps, ws.Qs, ws.tic, ws.qic, caps,
            )
            return state._replace(
                ws=ws, pints=pints, table=table, initialized=jnp.array(True)
            )

        def try_visual(state):
            """Path B fallback: visual SfM + IMU alignment
            (`initialStructure` `estimator.cpp:273-413`)."""
            if not params.use_visual_init:
                return state

            def do_vis(state):
                noise = pre.ImuNoise.create(
                    params.acc_n, params.gyr_n, params.acc_w, params.gyr_w
                )
                Ps, Qs, Vs, Bgs, pints2, ok = vinit.visual_initialize(
                    state.table, state.pints, state.imu_bufs,
                    state.ws.tic, state.ws.qic, W, params.g_norm, noise,
                )

                def accept(state):
                    ws = state.ws._replace(
                        Ps=Ps, Qs=Qs, Vs=Vs, Bgs=Bgs,
                        Bas=jnp.zeros_like(state.ws.Bas),
                    )
                    table = fm.triangulate_all(
                        state.table._replace(inv_depth=jnp.where(
                            state.table.lidar_flag, state.table.inv_depth, -1.0
                        )),
                        ws.Ps, ws.Qs, ws.tic, ws.qic, caps,
                    )
                    return state._replace(
                        ws=ws, pints=pints2, table=table,
                        initialized=jnp.array(True),
                    )

                return jax.lax.cond(ok, accept, lambda s: s, state)

            return jax.lax.cond(window_full, do_vis, lambda s: s, state)

        return jax.lax.cond(
            lidar_odom["available"] & window_full, do_init, try_visual, state
        )

    # while the extrinsic rotation is uncalibrated, initialization is
    # blocked ("rotation movement is needed", `estimator.cpp:219`)
    state = jax.lax.cond(
        state.initialized | (~state.ric_ok), lambda s: s, try_initialize, state
    )

    def solve_nonlinear(state):
        table = fm.triangulate_all(
            state.table, state.ws.Ps, state.ws.Qs, state.ws.tic, state.ws.qic, caps
        )
        G = jnp.array([0.0, 0.0, params.g_norm], state.ws.Ps.dtype)
        feat_valid = table.ids >= 0
        res = ba.solve(
            state.ws, table.inv_depth, table.obs, table.vel, table.obs_valid,
            table.start_frame, feat_valid, table.lidar_flag, state.pints,
            state.frame_valid, state.prior, G, state.td0, cfg,
            table_rt=table.rt,
        )
        state = state._replace(
            ws=res.ws, table=table._replace(inv_depth=res.inv_depth)
        )

        # marginalization
        def marg_o(state):
            pr = ba.marginalize_old(
                state.ws, state.table.inv_depth, state.table.obs, state.table.vel,
                state.table.obs_valid, state.table.start_frame,
                state.table.ids >= 0, state.table.lidar_flag, state.pints,
                state.frame_valid, state.prior, G, state.td0, cfg,
                table_rt=state.table.rt,
            )
            return state._replace(prior=pr)

        def marg_n(state):
            return state._replace(prior=ba.marginalize_second_new(state.prior, cfg))

        state = jax.lax.cond(marg_old, marg_o, marg_n, state)
        return state

    state = jax.lax.cond(
        state.initialized & window_full, solve_nonlinear, lambda s: s, state
    )

    # failure detection (`estimator.cpp:648-693`): bias/velocity sanity plus
    # the pose-jump checks against the previous frame's post-solve pose
    # (>5 m translation / >1 m z, `:671-681`; the little-feature and
    # delta-angle checks are dead code in the reference — `//return true`)
    j = jnp.minimum(state.frame_count, W)
    cur_P = state.ws.Ps[j]
    failed = state.initialized & (
        (jnp.linalg.norm(state.ws.Bas[j]) > params.ba_threshold)
        | (jnp.linalg.norm(state.ws.Bgs[j]) > params.bg_threshold)
        | (jnp.linalg.norm(state.ws.Vs[j]) > params.max_v_norm)
        | (state.last_P_ok & (jnp.linalg.norm(cur_P - state.last_P) > params.jump_t))
        | (state.last_P_ok & (jnp.abs(cur_P[2] - state.last_P[2]) > params.jump_z))
    )

    cfg_static = cfg

    def reboot(state):
        """`:188-196`: failure_occur -> clearState + setParameter. The
        incremented failure_count is the reset-id seen by the LIS."""
        fresh = _clear_state(state, caps, params)
        return fresh._replace(failure_count=state.failure_count + 1)

    def normal(state):
        # record last_P BEFORE the slide (`:205-211`)
        state = state._replace(last_P=cur_P, last_P_ok=state.initialized)
        return jax.lax.cond(
            window_full,
            lambda s: _slide_window(s, marg_old, caps, cfg_static),
            lambda s: s._replace(frame_count=s.frame_count + 1),
            state,
        )._replace(failed=jnp.array(False), last_marg_old=marg_old)

    state = jax.lax.cond(failed, reboot, normal, state)
    outputs = dict(
        pos=state.ws.Ps[jnp.minimum(state.frame_count, W)],
        quat=state.ws.Qs[jnp.minimum(state.frame_count, W)],
        vel=state.ws.Vs[jnp.minimum(state.frame_count, W)],
        initialized=state.initialized,
        failed=failed,
        is_keyframe=marg_old,
    )
    return state, outputs
