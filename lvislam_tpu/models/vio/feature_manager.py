"""Sliding-window feature table — the `FeatureManager` equivalent
(`vins_estimator/src/feature_manager.{h,cpp}`).

The reference keeps a linked list of `FeaturePerId` with per-frame
observation vectors; here it is a fixed-capacity table: F slots x (W+1)
window frames of normalized observations with validity masks. All
bookkeeping — id matching, parallax keyframe test (`addFeatureCheckParallax`
`feature_manager.cpp:45-106`), lidar depth adoption (`:74-79`), multi-view
triangulation (`:213-268`), window-shift with depth re-anchoring
(`removeBackShiftDepth`, `:285-339`) — is vectorized over slots.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...core import lie
from ...ops import triangulate as tri


@dataclasses.dataclass(frozen=True)
class VioCaps:
    window: int = 10  # WINDOW_SIZE (`parameters.h:14`)
    max_features: int = 512
    imu_buf: int = 64  # IMU samples per inter-frame interval
    frame_features: int = 150  # MAX_CNT incoming per frame
    ex_pairs: int = 24  # hand-eye calibration pair ring (ESTIMATE_EXTRINSIC=2)


class FeatureTable(NamedTuple):
    ids: jax.Array  # (F,) int32, -1 = free
    start_frame: jax.Array  # (F,)
    obs: jax.Array  # (F, W+1, 2) normalized plane coords
    vel: jax.Array  # (F, W+1, 2)
    obs_valid: jax.Array  # (F, W+1)
    inv_depth: jax.Array  # (F,) inverse depth in start frame; <=0 = uninit
    lidar_flag: jax.Array  # (F,) depth came from lidar (held constant in BA)
    # rolling-shutter row readout time per observation, seconds
    # (TR/ROW * row, `projection_td_factor.cpp:18-19`); zero = global shutter
    rt: jax.Array  # (F, W+1)


def table_init(caps: VioCaps, dtype=jnp.float32) -> FeatureTable:
    F, W1 = caps.max_features, caps.window + 1
    return FeatureTable(
        ids=jnp.full(F, -1, jnp.int32),
        start_frame=jnp.zeros(F, jnp.int32),
        obs=jnp.zeros((F, W1, 2), dtype),
        vel=jnp.zeros((F, W1, 2), dtype),
        obs_valid=jnp.zeros((F, W1), bool),
        inv_depth=jnp.full(F, -1.0, dtype),
        lidar_flag=jnp.zeros(F, bool),
        rt=jnp.zeros((F, W1), dtype),
    )


@partial(jax.jit, static_argnames=("caps", "min_parallax"))
def add_frame(
    table: FeatureTable,
    frame_idx: jax.Array,  # () current window frame index (<= W)
    in_ids: jax.Array,  # (N,) incoming feature ids (-1 invalid)
    in_norm: jax.Array,  # (N, 2)
    in_vel: jax.Array,  # (N, 2)
    in_depth: jax.Array,  # (N,) lidar depth (-1 none)
    in_valid: jax.Array,  # (N,)
    caps: VioCaps,
    min_parallax: float = 10.0 / 460.0,
    in_rt: jax.Array | None = None,  # (N,) rolling-shutter row time, seconds
):
    """`addFeatureCheckParallax` (`feature_manager.cpp:45-106`): insert the
    frame's observations and decide keyframe-ness by mean compensated
    parallax between frames W-1 and W-2. Returns (table, is_keyframe)."""
    Fcap = caps.max_features

    # match incoming ids against table slots: (F, N) equality
    eq = (table.ids[:, None] == in_ids[None, :]) & (table.ids[:, None] >= 0)
    eq &= in_valid[None, :]
    matched_slot = jnp.any(eq, axis=1)  # (F,) slot receives an obs
    src = jnp.argmax(eq, axis=1)  # (F,) which incoming row

    # new features: incoming ids with no matching slot
    is_new = in_valid & (in_ids >= 0) & (~jnp.any(eq, axis=0))
    free = table.ids < 0
    free_rank = jnp.cumsum(free) - 1
    new_rank = jnp.cumsum(is_new) - 1  # rank among new features
    # slot i takes the new feature whose rank equals the slot's free rank
    take_new = free & (free_rank < jnp.sum(is_new))
    # build mapping rank -> incoming index
    order = jnp.argsort(~is_new, stable=True)  # new features first
    src_new = order[jnp.clip(free_rank, 0, Fcap - 1)]

    fi = frame_idx
    row_obs = jnp.where(
        take_new[:, None], in_norm[src_new],
        jnp.where(matched_slot[:, None], in_norm[src], 0.0),
    )
    row_vel = jnp.where(
        take_new[:, None], in_vel[src_new],
        jnp.where(matched_slot[:, None], in_vel[src], 0.0),
    )
    obs = table.obs.at[jnp.arange(Fcap), fi].set(row_obs)
    vel = table.vel.at[jnp.arange(Fcap), fi].set(row_vel)
    obs_valid = table.obs_valid.at[jnp.arange(Fcap), fi].set(matched_slot | take_new)
    if in_rt is None:
        in_rt = jnp.zeros(in_ids.shape[0], table.rt.dtype)
    row_rt = jnp.where(
        take_new, in_rt[src_new], jnp.where(matched_slot, in_rt[src], 0.0)
    )
    rt = table.rt.at[jnp.arange(Fcap), fi].set(row_rt)

    ids = jnp.where(take_new, in_ids[src_new], table.ids)
    start_frame = jnp.where(take_new, fi, table.start_frame)
    # lidar depth adoption (`:74-79`): only when the feature starts at this
    # frame and lidar depth is valid
    new_depth = in_depth[src_new]
    inv_depth = jnp.where(
        take_new & (new_depth > 0), 1.0 / jnp.maximum(new_depth, 1e-3),
        jnp.where(take_new, -1.0, table.inv_depth),
    )
    lidar_flag = jnp.where(take_new, new_depth > 0, table.lidar_flag)
    # matched features may also adopt lidar depth if not yet solved
    m_depth = in_depth[src]
    adopt = matched_slot & (fi == table.start_frame) & (m_depth > 0) & (
        ~table.lidar_flag
    )
    inv_depth = jnp.where(adopt, 1.0 / jnp.maximum(m_depth, 1e-3), inv_depth)
    lidar_flag = lidar_flag | adopt

    new_table = FeatureTable(
        ids=ids, start_frame=start_frame, obs=obs, vel=vel,
        obs_valid=obs_valid, inv_depth=inv_depth, lidar_flag=lidar_flag,
        rt=rt,
    )

    # ---- parallax keyframe test ----
    # compensated parallax of features observed in both frame_idx-2 and -1
    f1 = jnp.maximum(fi - 1, 0)
    f2 = jnp.maximum(fi - 2, 0)
    seen = (
        obs_valid[jnp.arange(Fcap), f1]
        & obs_valid[jnp.arange(Fcap), f2]
        & (ids >= 0)
    )
    p1 = obs[jnp.arange(Fcap), f1]
    p2 = obs[jnp.arange(Fcap), f2]
    par = jnp.linalg.norm(p1 - p2, axis=-1)
    n_par = jnp.sum(seen)
    mean_par = jnp.sum(jnp.where(seen, par, 0.0)) / jnp.maximum(n_par, 1)
    # reference: keyframe if frame_count < 2, few long tracks, or parallax
    long_track = jnp.sum((table.ids >= 0) & matched_slot)
    is_kf = (fi < 2) | (long_track < 20) | (mean_par >= min_parallax)
    return new_table, is_kf


def _fix_anchors(table: FeatureTable) -> FeatureTable:
    """Re-anchor features whose start-frame observation vanished in a slide
    (the reference erases the front observation and the list's new head
    becomes the anchor, `feature_manager.cpp:285-339`): start_frame := first
    valid obs; a moved anchor invalidates the depth (re-triangulated on the
    next solve)."""
    W1 = table.obs.shape[1]
    has = jnp.any(table.obs_valid, axis=1)
    first = jnp.argmax(table.obs_valid, axis=1).astype(jnp.int32)
    moved = has & (first != table.start_frame)
    return table._replace(
        start_frame=jnp.where(has, first, table.start_frame),
        inv_depth=jnp.where(moved, -1.0, table.inv_depth),
        lidar_flag=table.lidar_flag & (~moved),
    )


@partial(jax.jit, static_argnames=("caps",))
def slide_old(
    table: FeatureTable,
    P0_new: jax.Array,  # marg frame camera pose (R (3,3), t) world<-cam
    R0_marg: jax.Array,
    P1_new: jax.Array,  # new frame-0 camera pose
    R1_new: jax.Array,
    caps: VioCaps,
):
    """MARGIN_OLD shift (`slideWindow` + `removeBackShiftDepth`,
    `estimator.cpp:979-1099`, `feature_manager.cpp:285-339`): drop frame 0,
    shift all observations left; features anchored at frame 0 re-anchor to
    the new frame 0 with depth re-projected through both camera poses."""
    Fcap, W1 = table.obs.shape[0], table.obs.shape[1]
    anchored0 = (table.ids >= 0) & (table.start_frame == 0)
    first_obs = table.obs[:, 0]

    # shift left
    obs = jnp.concatenate([table.obs[:, 1:], jnp.zeros_like(table.obs[:, :1])], axis=1)
    vel = jnp.concatenate([table.vel[:, 1:], jnp.zeros_like(table.vel[:, :1])], axis=1)
    obs_valid = jnp.concatenate(
        [table.obs_valid[:, 1:], jnp.zeros_like(table.obs_valid[:, :1])], axis=1
    )
    rt = jnp.concatenate([table.rt[:, 1:], jnp.zeros_like(table.rt[:, :1])], axis=1)
    start_frame = jnp.maximum(table.start_frame - 1, 0)

    # depth re-anchoring for features anchored at old frame 0 that survive
    survives = anchored0 & obs_valid[:, 0]
    depth = 1.0 / jnp.maximum(table.inv_depth, 1e-6)
    pts_cam0 = jnp.concatenate(
        [first_obs, jnp.ones((Fcap, 1), first_obs.dtype)], axis=-1
    ) * depth[:, None]
    pts_w = pts_cam0 @ R0_marg.T + P0_new[None, :]
    pts_cam1 = (pts_w - P1_new[None, :]) @ R1_new
    new_depth = pts_cam1[:, 2]
    new_inv = jnp.where(new_depth > 0.1, 1.0 / new_depth, -1.0)
    inv_depth = jnp.where(
        survives & (table.inv_depth > 0), new_inv,
        jnp.where(anchored0, -1.0, table.inv_depth),
    )

    # drop features with no remaining observations
    alive = (table.ids >= 0) & jnp.any(obs_valid, axis=1)
    ids = jnp.where(alive, table.ids, -1)
    return _fix_anchors(FeatureTable(
        ids=ids, start_frame=start_frame, obs=obs, vel=vel,
        obs_valid=obs_valid, inv_depth=jnp.where(alive, inv_depth, -1.0),
        lidar_flag=table.lidar_flag & alive,
        rt=rt,
    ))


@partial(jax.jit, static_argnames=("caps",))
def slide_new(table: FeatureTable, caps: VioCaps):
    """MARGIN_SECOND_NEW (`slideWindowNew` / `removeFront`): frame W-1's
    observations vanish; frame W moves into slot W-1."""
    W = caps.window
    Fcap = table.obs.shape[0]
    obs = table.obs.at[:, W - 1].set(table.obs[:, W])
    vel = table.vel.at[:, W - 1].set(table.vel[:, W])
    obs_valid = table.obs_valid.at[:, W - 1].set(table.obs_valid[:, W])
    rt = table.rt.at[:, W - 1].set(table.rt[:, W]).at[:, W].set(0.0)
    obs = obs.at[:, W].set(0.0)
    vel = vel.at[:, W].set(0.0)
    obs_valid = obs_valid.at[:, W].set(False)
    start_frame = jnp.where(table.start_frame == W, W - 1, table.start_frame)
    alive = (table.ids >= 0) & jnp.any(obs_valid, axis=1)
    return _fix_anchors(table._replace(
        ids=jnp.where(alive, table.ids, -1),
        start_frame=start_frame,
        obs=obs, vel=vel, obs_valid=obs_valid, rt=rt,
        inv_depth=jnp.where(alive, table.inv_depth, -1.0),
        lidar_flag=table.lidar_flag & alive,
    ))


@partial(jax.jit, static_argnames=("caps",))
def triangulate_all(
    table: FeatureTable,
    Ps: jax.Array,  # (W+1, 3) body positions (world)
    Qs: jax.Array,  # (W+1, 4) body orientations
    tic: jax.Array,  # (3,) imu->cam translation
    qic: jax.Array,  # (4,)
    caps: VioCaps,
):
    """Triangulate features without depth (`FeatureManager::triangulate`,
    `feature_manager.cpp:213-268`): multi-view DLT per feature in its start-
    frame camera; INIT_DEPTH=5 fallback for failures is applied by caller."""
    W1 = caps.window + 1
    # camera poses per frame: T_wc = T_wb * T_bc
    t_wc, q_wc = jax.vmap(lambda p, q: lie.se3_compose(p, q, tic, qic))(Ps, Qs)
    R_cw = jax.vmap(lambda q: lie.quat_to_matrix(lie.quat_conjugate(q)))(q_wc)
    t_cw = -jnp.einsum("kij,kj->ki", R_cw, t_wc)

    def one(obsk, validk, sf):
        # express all views relative to the start-frame camera
        R0 = lie.quat_to_matrix(q_wc[sf])
        t0 = t_wc[sf]
        # world->cam_k composed with cam0->world: R_k (R0 x + t0) + t_k
        Rrel = jnp.einsum("kij,jl->kil", R_cw, R0)
        trel = jnp.einsum("kij,j->ki", R_cw, t0) + t_cw
        pt, depth0 = tri.triangulate_multiview(Rrel, trel, obsk, validk)
        return depth0

    need = (table.ids >= 0) & (table.inv_depth <= 0) & (
        jnp.sum(table.obs_valid, axis=1) >= 2
    )
    depths = jax.vmap(one)(table.obs, table.obs_valid, table.start_frame)
    inv = jnp.where(depths > 0.1, 1.0 / depths, 1.0 / 5.0)  # INIT_DEPTH
    return table._replace(
        inv_depth=jnp.where(need, inv, table.inv_depth)
    )
