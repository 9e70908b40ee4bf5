"""Visual feature tracker — the VIS front-end.

TPU re-design of the reference's `FeatureTracker` + `feature_tracker_node`
(`feature_tracker/src/feature_tracker.cpp:81-347`, `feature_tracker_node.cpp:
37-270`): per frame

1. CLAHE equalization (`:86-92`, flag `equalize`),
2. pyramidal LK prev->cur (`ops.klt`, the cv::cuda path `:115-135`),
3. border culling (`inBorder`, `:12-18`),
4. F-matrix RANSAC outlier rejection on virtual-pinhole projections of the
   undistorted rays (`rejectWithF`, `:209-242`, FOCAL_LENGTH=460),
5. min-dist refill to MAX_CNT via Shi-Tomasi grid detection (`ops.gftt`,
   replacing setMask + GFTT `:36-69,162-191`),
6. undistortion to the normalized plane + per-id velocity (`:298-347`),
7. lidar depth channel via `ops.depth_assoc` (DepthRegister).

The whole step is one jitted function over a fixed-capacity feature table
(MAX_CNT slots, id -1 = free). Track ids are allocated on device with a
cumsum over freed slots. The host wrapper handles the FREQ publish throttle
and the stream-gap restart protocol (`feature_tracker_node.cpp:50-60,
100-112`).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ...core.config import CameraIntrinsics
from ...ops import camera, depth_assoc, gftt, image as imops, klt, ransac


@dataclasses.dataclass(frozen=True)
class TrackerParams:
    max_cnt: int = 150
    min_dist: int = 20
    F_threshold: float = 1.0
    equalize: bool = True
    focal_virtual: float = 460.0  # FOCAL_LENGTH for rejectWithF
    border: int = 10
    klt_levels: int = 3
    klt_half: int = 10
    klt_iters: int = 30
    # per-level sampled neighborhood of the patch-resident LK (ops.klt);
    # margin = klt_patch/2 - klt_half - 2 px bounds trackable coarse-level
    # motion — raise for low-frame-rate / fast-rotation rigs
    klt_patch: int = 32
    min_track_for_F: int = 8


class TrackerState(NamedTuple):
    # previous (equalized) frame as its full LK pyramid — cached so each
    # step builds only the NEW frame's pyramid (the prev one was already
    # built when that frame was the current one; rebuilding it doubled the
    # pyramid cost, ~1.8 ms/frame at 1024x576)
    prev_pyr: tuple  # (levels+1) of (H/2^l, W/2^l)
    pts: jax.Array  # (N, 2) pixels
    ids: jax.Array  # (N,) int32, -1 = free slot
    track_cnt: jax.Array  # (N,)
    norm_pts: jax.Array  # (N, 2) undistorted normalized plane
    next_id: jax.Array  # ()
    prev_time: jax.Array  # ()
    initialized: jax.Array  # () bool


class TrackerOutput(NamedTuple):
    ids: jax.Array  # (N,)
    uv: jax.Array  # (N, 2)
    norm: jax.Array  # (N, 2)
    vel: jax.Array  # (N, 2) normalized-plane velocity
    valid: jax.Array  # (N,) features with track_cnt > 1 (reference publishes those)
    n_tracked: jax.Array


def tracker_init(height: int, width: int, params: TrackerParams, dtype=jnp.float32):
    N = params.max_cnt
    shapes, h, w = [(height, width)], height, width
    for _ in range(params.klt_levels):
        h, w = (h + 1) // 2, (w + 1) // 2  # pyr_down keeps ceil(n/2)
        shapes.append((h, w))
    return TrackerState(
        prev_pyr=tuple(jnp.zeros(s, dtype) for s in shapes),
        pts=jnp.zeros((N, 2), dtype),
        ids=jnp.full(N, -1, jnp.int32),
        track_cnt=jnp.zeros(N, jnp.int32),
        norm_pts=jnp.zeros((N, 2), dtype),
        next_id=jnp.int32(0),
        prev_time=jnp.float32(-1.0),
        initialized=jnp.array(False),
    )


def seed_prev_image(state: TrackerState, img: jax.Array, params: TrackerParams):
    """Install `img` as the previous frame (equalized + pyramid), for tests
    and benches that seed a mid-stream tracker state directly."""
    if params.equalize:
        img = imops.clahe(img)
    return state._replace(
        prev_pyr=tuple(imops.build_pyramid(img, params.klt_levels)),
        initialized=jnp.array(True),
    )


@partial(jax.jit, static_argnames=("params", "cam"))
def tracker_step(
    state: TrackerState,
    img: jax.Array,  # (H, W) float in [0, 1]
    t: jax.Array,  # () stamp
    params: TrackerParams,
    cam: CameraIntrinsics,
):
    """One `readImage` (`feature_tracker.cpp:81-207`)."""
    H, W = img.shape
    N = params.max_cnt
    if params.equalize:
        img = imops.clahe(img)

    occupied = state.ids >= 0

    # --- LK track forward (prev pyramid cached in state) ---
    next_pyr = tuple(imops.build_pyramid(img, params.klt_levels))
    res = klt.track(
        None, img, state.pts, occupied & state.initialized,
        levels=params.klt_levels, half=params.klt_half, iters=params.klt_iters,
        patch=params.klt_patch, prev_pyr=state.prev_pyr, next_pyr=next_pyr,
    )
    pts = res.pts
    tracked = res.status
    # border culling
    inb = (
        (pts[:, 0] >= params.border) & (pts[:, 0] < W - params.border)
        & (pts[:, 1] >= params.border) & (pts[:, 1] < H - params.border)
    )
    tracked &= inb

    # --- undistort + rejectWithF on the virtual pinhole ---
    norm_new = camera.normalized_plane(pts, cam)
    enough = jnp.sum(tracked) >= params.min_track_for_F

    def reject(args):
        norm_prev, norm_new, tracked = args
        vp_prev = norm_prev * params.focal_virtual + jnp.array([W / 2.0, H / 2.0])
        vp_new = norm_new * params.focal_virtual + jnp.array([W / 2.0, H / 2.0])
        fr = ransac.fundamental_ransac(
            vp_prev, vp_new, tracked, threshold=params.F_threshold, n_hyp=128
        )
        return tracked & fr.inliers

    tracked = jax.lax.cond(
        enough, reject, lambda a: a[2], (state.norm_pts, norm_new, tracked)
    )

    # velocity in the normalized plane (`undistortedPoints`, `:298-347`)
    dt = jnp.maximum(t - state.prev_time, 1e-3)
    vel = jnp.where(
        (tracked & (state.track_cnt > 0))[:, None],
        (norm_new - state.norm_pts) / dt,
        0.0,
    )

    track_cnt = jnp.where(tracked, state.track_cnt + 1, 0)
    ids = jnp.where(tracked, state.ids, -1)

    # --- refill with new detections, only when slots are free — the
    # reference skips goodFeaturesToTrack entirely when n_max_cnt == 0
    # (`feature_tracker.cpp:138-160`); the Shi-Tomasi response over the
    # whole image is the tracker's priciest op, so the cond saves it on
    # full frames ---
    def refill(args):
        pts, ids, track_cnt, norm_new, vel = args
        new_pts, new_valid = gftt.detect(
            img, pts, tracked, max_pts=N, cell=params.min_dist,
            border=params.border,
        )
        free = ~tracked
        # rank free slots / detections; k-th detection fills k-th free slot
        free_rank = jnp.cumsum(free) - 1  # rank among free slots per slot
        det_ok = new_valid
        det_rank_of_slot = free_rank  # detection index used by this slot
        take = free & (det_rank_of_slot < jnp.sum(det_ok))
        # detections are sorted by response from top_k; compact valid ones
        det_order = jnp.argsort(~det_ok, stable=True)
        det_pts_sorted = new_pts[det_order]
        sel_det = det_pts_sorted[jnp.clip(det_rank_of_slot, 0, N - 1)]
        pts = jnp.where(take[:, None], sel_det, pts)
        new_ids = state.next_id + free_rank.astype(jnp.int32)
        ids = jnp.where(take, new_ids, ids)
        track_cnt = jnp.where(take, 1, track_cnt)
        norm_new = jnp.where(
            take[:, None], camera.normalized_plane(pts, cam), norm_new
        )
        vel = jnp.where(take[:, None], 0.0, vel)
        next_id = state.next_id + jnp.sum(take).astype(jnp.int32)
        return pts, ids, track_cnt, norm_new, vel, next_id

    pts, ids, track_cnt, norm_new, vel, next_id = jax.lax.cond(
        jnp.sum(tracked) < N,
        refill,
        lambda a: (*a, state.next_id),
        (pts, ids, track_cnt, norm_new, vel),
    )

    new_state = TrackerState(
        prev_pyr=next_pyr,
        pts=pts,
        ids=ids,
        track_cnt=track_cnt,
        norm_pts=norm_new,
        next_id=next_id,
        prev_time=t,
        initialized=jnp.array(True),
    )
    out = TrackerOutput(
        ids=ids,
        uv=pts,
        norm=norm_new,
        vel=vel,
        valid=(ids >= 0) & (track_cnt > 1),
        n_tracked=jnp.sum(tracked),
    )
    return new_state, out


@partial(jax.jit, static_argnames=("num_bins",))
def register_depth(
    out_norm: jax.Array,  # (N, 2)
    out_valid: jax.Array,
    cloud_world: jax.Array,  # (P, 3) accumulated depth cloud (world frame)
    cloud_valid: jax.Array,
    body_trans: jax.Array,  # (3,) vins_world -> vins_body_ros transform
    body_quat: jax.Array,  # (4,)
    num_bins: int = 360,
):
    """DepthRegister.get_depth wrapper: transforms the world cloud into the
    camera body frame then associates (`feature_tracker.h:139-150`)."""
    from ...core import lie

    ti, qi = lie.se3_inverse(body_trans, body_quat)
    local = lie.quat_rotate(qi[None], cloud_world) + ti[None]
    return depth_assoc.feature_depths(
        out_norm, out_valid, local, cloud_valid, num_bins=num_bins
    )
