"""LIS map optimization — keyframe mapping, scan-to-map registration, factor
graph, loop closure.

TPU re-design of the reference's `mapOptimization` node
(`lidar_odometry/src/mapOptimization.cpp:49-1809`). The node's mutable C++
state (PCL clouds, kd-trees, GTSAM graph, OpenCV mats) becomes one
fixed-shape `LioMapState` pytree; the per-scan handler
(`laserCloudInfoHandler`, `:298-332`) becomes a single jitted function
`map_step` containing:

- `updateInitialGuess` (`:806-877`): VINS-increment > IMU-increment priority
  chain, reproduced with lax.cond on flags carried in the state;
- local map assembly (`extractNearby`/`extractCloud`, `:894-970`): top-K
  nearest keyframes within the search radius + last-10 s keyframes, clouds
  gathered, transformed, and voxel-downsampled on device;
- scan downsampling (`downsampleCurrentScan`, `:987-999`);
- scan-to-map Gauss-Newton (`ops.scan2map`, exact 5-NN semantics);
- IMU roll/pitch slerp fusion + constraint clamps (`transformUpdate`,
  `:1345-1385`);
- keyframe gating + factor insertion (`saveFrame`/`addOdomFactor`,
  `:1387-1431`) into the `ops.posegraph` store;
- batch re-optimization + pose rewrite when loop/GPS factors are pending
  (`saveKeyFramesAndFactor` + `correctPoses`, `:1529-1646`);
- global + incremental odometry outputs (`publishOdometry`, `:1666-1746`),
  the incremental channel being the pure scan-match delta chain with the
  degenerate flag.

Loop closure (`performLoopClosure` thread, `:523-741`) is a separate jitted
function `loop_closure_step` run at its own cadence by the scheduler.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...core import lie
from ...ops import icp as icp_ops
from ...ops import posegraph as pg
from ...ops import pointcloud as pc
from ...ops import scan2map
from ...ops import voxel_hash as vh
from .frontend import FeatureResult


@dataclasses.dataclass(frozen=True)
class LioCaps:
    """Static capacities (jit-time constants)."""

    max_keyframes: int = 512
    kf_corner: int = 512  # stored corner points per keyframe (downsampled)
    kf_surf: int = 2048  # stored surf points per keyframe
    sel_keyframes: int = 48  # local-map keyframe selection cap
    map_corner: int = 16384  # assembled local map capacity
    map_surf: int = 65536
    scan_corner: int = 1024
    scan_surf: int = 4096
    max_loops: int = 32
    max_gps: int = 64
    loop_submap: int = 16384  # ICP target capacity
    icp_iters: int = 25
    corner_hash_size: int = 1 << 14  # voxel-hash tables for the gated 5-NN
    surf_hash_size: int = 1 << 16
    hash_bucket: int = 32
    # surf buckets can be shallower: the 0.4 m surf leaf caps a 1 m cell at
    # ~16 voxel centers, and the (Q,27,B,4) candidate gather is the hot
    # HBM-bound op in scan-to-map — halving B halves it for surf queries.
    surf_hash_bucket: int = 16
    # fuse the query tail into the Pallas VMEM kernel (`ops.pallas_knn`);
    # TPU only (CPU tests keep the XLA path — identical selection)
    pallas_knn: bool = False
    # fuse the whole per-iteration coefficient + JtJ pipeline into the
    # Pallas kernel (`ops.pallas_gn`) — the XLA chain is ~95 kernel
    # launches of latency per GN iteration; parity tested in
    # tests/test_pallas_gn.py
    pallas_gn: bool = False
    # leaf-occupancy dedup tables for incremental map updates (only
    # allocated when LioParams.mapRebuildEvery > 1)
    corner_leaf_table: int = 1 << 15
    surf_leaf_table: int = 1 << 17


@dataclasses.dataclass(frozen=True)
class LioParams:
    """Dynamic-value parameters (from `params_lidar.yaml`)."""

    mappingCornerLeafSize: float = 0.2
    mappingSurfLeafSize: float = 0.4
    surroundingKeyframeSearchRadius: float = 50.0
    keyframeAddingDistThreshold: float = 1.0
    keyframeAddingAngleThreshold: float = 0.2
    imuRPYWeight: float = 0.01
    z_tollerance: float = 1000.0
    rotation_tollerance: float = 1000.0
    useImuHeadingInitialization: bool = False
    livox_keyframe_interval: float = 1.0
    historyKeyframeSearchRadius: float = 15.0
    historyKeyframeSearchTimeDiff: float = 30.0
    historyKeyframeSearchNum: int = 25
    historyKeyframeFitnessScore: float = 0.3
    edgeFeatureMinValidNum: int = 10
    surfFeatureMinValidNum: int = 100
    gpsCovThreshold: float = 2.0
    poseCovThreshold: float = 25.0
    # degeneracy eigenvalue threshold (`mapOptimization.cpp:1279` hardcodes
    # 100; exposed because its scale follows the residual count / sensor
    # resolution)
    degeneracyEigenThreshold: float = 100.0
    # correspondence re-search interval inside the GN loop (1 = reference)
    nnRefreshEvery: int = 1
    # gather each query's 27-cell candidate neighborhood once per scan and
    # re-score it every GN iteration (requires caps.pallas_knn; see
    # scan2map.scan_to_map_hashed(gather_once=...)) — removes the
    # HBM-latency-bound row gather from the GN loop entirely while keeping
    # per-iteration-fresh correspondences
    gatherOncePerScan: bool = False
    # full local-map rebuild interval in keyframes. 1 = the reference's
    # per-keyframe extractNearby/extractCloud re-downsample. >1 switches to
    # incremental updates: the new keyframe's cloud is leaf-deduped against
    # the existing map (first-point-wins instead of centroid — re-centroided
    # at the next full rebuild), appended, and scatter-inserted into the
    # hashes; full rebuilds still run every Nth keyframe, on loop/GPS
    # corrections (poses moved), and on capacity pressure. Cuts the ~7.5 ms
    # per-keyframe rebuild (sort-based build over 16k+65k points) to ~1 ms
    # of O(new-points) work on the other N-1 keyframes.
    mapRebuildEvery: int = 1
    # apply the previous scan-match delta as a constant-velocity position
    # guess when no VINS odometry is available (LIO-SAM standalone feeds its
    # IMU-preintegrated odometry here; rotation still comes from the IMU)
    constantVelocityGuess: bool = True
    # plausibility gate on the VINS guess increment (beyond the
    # reference): a diverging VIO below its own failure thresholds (V < 30
    # m/s) would otherwise walk the scan-match guess outside the 1 m
    # correspondence gate and progressively corrupt the map. The gate is
    # CONSISTENCY-based (speed-independent): the VINS per-scan delta must
    # agree with the previous scan-match delta within a physical
    # acceleration allowance, and rotate no faster than the gyro envelope.
    # Rejected increments fall back to the IMU/constant-velocity guess;
    # the VINS pose keeps being tracked so recovery is seamless.
    vinsGuessMaxDeltaJump: float = 0.5  # m vs last scan-match delta (50 m/s^2 at 10 Hz)
    vinsGuessMaxRotRate: float = 3.0  # rad/s


class LioMapState(NamedTuple):
    # current scan-matched pose [roll, pitch, yaw, x, y, z]
    x6: jax.Array  # (6,)
    # keyframe database
    kf_trans: jax.Array  # (K, 3) optimized keyframe positions
    kf_quat: jax.Array  # (K, 4)
    kf_time: jax.Array  # (K,)
    kf_count: jax.Array  # () int32
    kf_corner: jax.Array  # (K, C, 3) keyframe corner cloud (lidar frame)
    kf_corner_valid: jax.Array  # (K, C)
    kf_surf: jax.Array  # (K, S, 3)
    kf_surf_valid: jax.Array  # (K, S)
    # factor graph (pose-graph store shared with ops.posegraph)
    graph: pg.PoseGraph
    n_loops: jax.Array  # () int32 count of loop factors added
    loop_pending: jax.Array  # () bool — aLoopIsClosed
    last_loop_kf: jax.Array  # () int32 index of last kf used for loop search
    # initial-guess bookkeeping (`updateInitialGuess` statics)
    last_imu_rpy: jax.Array  # (3,)
    last_imu_valid: jax.Array  # () bool
    last_vins_trans: jax.Array  # (3,)
    last_vins_quat: jax.Array  # (4,)
    last_vins_valid: jax.Array  # () bool
    vins_reset_id: jax.Array  # () int32
    # incremental odometry chain (`publishOdometry` statics)
    incr_x6: jax.Array  # (6,) incremental odometry pose
    degenerate: jax.Array  # () bool
    last_scan_stamp: jax.Array  # () last processed scan time (guess-gate dt)
    last_gn_ok: jax.Array  # () bool — last scan-match was healthy (the
    # VINS-guess consistency gate only engages then; without a working
    # scan-match the VINS guess is the best signal available)
    # previous scan-match delta (constant-velocity guess)
    last_delta_t: jax.Array  # (3,)
    last_delta_q: jax.Array  # (4,)
    # GPS factor bookkeeping (`addGPSFactor` statics: lastGPSPoint)
    last_gps_pos: jax.Array  # (3,)
    has_gps: jax.Array  # () bool — any GPS factor applied yet
    n_gps: jax.Array  # () int32 count of GPS factors added
    # first-order x/y marginal-covariance proxy of the newest keyframe (the
    # reference reads iSAM's marginalCovariance(3,3)/(4,4) to gate GPS,
    # `mapOptimization.cpp:1437-1445`; the batch solver has no cheap
    # marginals, so the same quantity is propagated in closed form — see
    # `_add_keyframe`)
    pose_cov_xy: jax.Array  # ()
    yaw_var: jax.Array  # () accumulated yaw variance (leverage term)
    # yaw-position cross-covariance magnitude: successive hops share the
    # SAME yaw error, so lateral variance grows quadratically with distance
    # from the last absolute fix (d^2 * yaw_var), not linearly per hop —
    # validated against the exact dense marginal in tests/test_gps.py
    pose_cov_cross: jax.Array  # ()
    # per-keyframe snapshots of (cov_xy, yaw_var, cross) at insertion time:
    # a loop factor re-anchors the newest pose to an old keyframe, so its
    # marginal collapses to ~the anchor's snapshot + the ICP noise
    # (`_loop_icp`). Snapshots go stale-high after later GPS/loop
    # corrections tighten the graph — conservative (admits GPS early, the
    # safe direction for the reference's need gate)
    kf_cov_xy: jax.Array  # (K,)
    kf_yaw_var: jax.Array  # (K,)
    kf_cov_cross: jax.Array  # (K,)
    # cached assembled local map (the reference's laserCloudMapContainer +
    # *FromMapDS, rebuilt on keyframe insertion / loop correction instead of
    # per scan — identical content, since the keyframe set only changes then)
    map_corner: jax.Array  # (Mc, 3)
    map_corner_valid: jax.Array  # (Mc,)
    map_surf: jax.Array  # (Ms, 3)
    map_surf_valid: jax.Array  # (Ms,)
    corner_hash: vh.VoxelHash  # gated-5NN index over map_corner
    surf_hash: vh.VoxelHash
    # incremental-update bookkeeping (mapRebuildEvery > 1): appended-point
    # counts, keyframes since the last full rebuild, and leaf-occupancy
    # dedup tables (i16 cell tags; (1,) placeholders when disabled)
    map_corner_n: jax.Array  # () int32
    map_surf_n: jax.Array  # () int32
    kf_since_rebuild: jax.Array  # () int32
    leaf_occ_corner: jax.Array  # (Tlc,) int16
    leaf_occ_surf: jax.Array  # (Tls,) int16
    # running per-leaf centroid accumulators (incremental mode): every new
    # observation of an occupied leaf scatter-adds into its map row's sum /
    # count and the row is re-centroided — the union-downsample averaging
    # the reference's per-keyframe rebuild gets for free
    # (`mapOptimization.cpp:931-970`), without which map points freeze at
    # the FIRST observation's pose error (measured +19% LIO / +62% LVI ATE
    # at mapRebuildEvery=8; see scripts/bisect_lio.py)
    leaf_row_corner: jax.Array  # (Tlc,) int32 map row of each claimed leaf
    leaf_row_surf: jax.Array  # (Tls,) int32
    map_corner_accum: jax.Array  # (Mc, 3) per-row position sums
    map_corner_cnt: jax.Array  # (Mc,) observation counts
    map_surf_accum: jax.Array  # (Ms, 3)
    map_surf_cnt: jax.Array  # (Ms,)


class MapOutputs(NamedTuple):
    x6: jax.Array  # global odometry pose
    incr_x6: jax.Array  # incremental odometry pose (scan-match delta chain)
    degenerate: jax.Array
    is_keyframe: jax.Array
    num_residuals: jax.Array
    gn_iters: jax.Array


def lio_init(caps: LioCaps, dtype=jnp.float32) -> LioMapState:
    K = caps.max_keyframes
    return LioMapState(
        x6=jnp.zeros(6, dtype),
        kf_trans=jnp.zeros((K, 3), dtype),
        kf_quat=jnp.tile(lie.quat_identity(dtype), (K, 1)),
        kf_time=jnp.zeros(K, dtype),
        kf_count=jnp.int32(0),
        kf_corner=jnp.zeros((K, caps.kf_corner, 3), dtype),
        kf_corner_valid=jnp.zeros((K, caps.kf_corner), bool),
        kf_surf=jnp.zeros((K, caps.kf_surf, 3), dtype),
        kf_surf_valid=jnp.zeros((K, caps.kf_surf), bool),
        graph=pg.empty_graph(K, K + caps.max_loops, caps.max_gps, dtype),
        n_loops=jnp.int32(0),
        loop_pending=jnp.array(False),
        last_loop_kf=jnp.int32(-1),
        last_imu_rpy=jnp.zeros(3, dtype),
        last_imu_valid=jnp.array(False),
        last_vins_trans=jnp.zeros(3, dtype),
        last_vins_quat=lie.quat_identity(dtype),
        last_vins_valid=jnp.array(False),
        vins_reset_id=jnp.int32(0),
        incr_x6=jnp.zeros(6, dtype),
        degenerate=jnp.array(False),
        last_scan_stamp=jnp.float32(-1.0),
        last_gn_ok=jnp.array(False),
        last_delta_t=jnp.zeros(3, dtype),
        last_delta_q=lie.quat_identity(dtype),
        last_gps_pos=jnp.zeros(3, dtype),
        has_gps=jnp.array(False),
        n_gps=jnp.int32(0),
        # the prior leaves position free (var 1e8, `mapOptimization.cpp:
        # 1418`) — absolute x/y covariance is huge until the first GPS fix
        pose_cov_xy=jnp.asarray(1e8, dtype),
        yaw_var=jnp.asarray(9.8696044, dtype),  # prior yaw var (pi^2)
        pose_cov_cross=jnp.asarray(0.0, dtype),
        kf_cov_xy=jnp.full(caps.max_keyframes, 1e8, dtype),
        kf_yaw_var=jnp.full(caps.max_keyframes, 9.8696044, dtype),
        kf_cov_cross=jnp.zeros(caps.max_keyframes, dtype),
        map_corner=jnp.zeros((caps.map_corner, 3), dtype),
        map_corner_valid=jnp.zeros(caps.map_corner, bool),
        map_surf=jnp.zeros((caps.map_surf, 3), dtype),
        map_surf_valid=jnp.zeros(caps.map_surf, bool),
        corner_hash=vh.build(
            jnp.zeros((caps.map_corner, 3), dtype), jnp.zeros(caps.map_corner, bool),
            1.0, caps.corner_hash_size, caps.hash_bucket,
        ),
        surf_hash=vh.build(
            jnp.zeros((caps.map_surf, 3), dtype), jnp.zeros(caps.map_surf, bool),
            1.0, caps.surf_hash_size, caps.surf_hash_bucket,
        ),
        map_corner_n=jnp.int32(0),
        map_surf_n=jnp.int32(0),
        kf_since_rebuild=jnp.int32(0),
        leaf_occ_corner=jnp.full(caps.corner_leaf_table, -1, jnp.int16),
        leaf_occ_surf=jnp.full(caps.surf_leaf_table, -1, jnp.int16),
        leaf_row_corner=jnp.full(caps.corner_leaf_table, -1, jnp.int32),
        leaf_row_surf=jnp.full(caps.surf_leaf_table, -1, jnp.int32),
        map_corner_accum=jnp.zeros((caps.map_corner, 3), dtype),
        map_corner_cnt=jnp.zeros(caps.map_corner, dtype),
        map_surf_accum=jnp.zeros((caps.map_surf, 3), dtype),
        map_surf_cnt=jnp.zeros(caps.map_surf, dtype),
    )


def _x6_to_tq(x6):
    q = lie.matrix_to_quat(
        lie.ypr_to_matrix(jnp.stack([x6[2], x6[1], x6[0]]) * (180.0 / jnp.pi))
    )
    return x6[3:6], q


def _tq_to_x6(t, q):
    ypr = lie.matrix_to_ypr(lie.quat_to_matrix(q)) * (jnp.pi / 180.0)
    return jnp.concatenate([jnp.stack([ypr[2], ypr[1], ypr[0]]), t])


def _update_initial_guess(state: LioMapState, scan, params: LioParams):
    """`updateInitialGuess` (`mapOptimization.cpp:806-877`)."""
    imu_rpy = scan["imu_rpy_init"]
    imu_ok = scan["imu_available"]
    odom_ok = scan["odom_available"]

    def first_frame(_):
        yaw = jnp.where(params.useImuHeadingInitialization, imu_rpy[2], 0.0)
        x6 = jnp.concatenate([jnp.stack([imu_rpy[0], imu_rpy[1], yaw]), jnp.zeros(3)])
        return x6, state.last_vins_valid, state.last_vins_trans, state.last_vins_quat, state.vins_reset_id

    def later_frame(_):
        # plausibility gate (beyond the reference): a diverging VIO can
        # emit large per-scan deltas long before its own failureDetection
        # thresholds fire (V < 30 m/s) — an implausible increment would put
        # the scan-match guess outside the 1 m correspondence gate and
        # progressively corrupt the map. Gate by per-scan delta bounds and
        # fall back to the IMU/constant-velocity guess; keep tracking the
        # VINS pose so recovery is seamless.
        ti_v, qi_v = lie.se3_relative(
            state.last_vins_trans, state.last_vins_quat,
            scan["odom_trans"], scan["odom_quat"],
        )
        ang_v = 2.0 * jnp.arccos(jnp.clip(jnp.abs(qi_v[0]), 0.0, 1.0))
        dt = jnp.where(
            state.last_scan_stamp > 0.0,
            jnp.clip(scan["stamp"] - state.last_scan_stamp, 1e-2, 1.0),
            jnp.float32(0.1),
        )
        sane = (~state.last_vins_valid) | (~state.last_gn_ok) | (
            (jnp.linalg.norm(ti_v - state.last_delta_t)
             < params.vinsGuessMaxDeltaJump)
            & (ang_v < params.vinsGuessMaxRotRate * dt)
        )
        vins_usable = (
            odom_ok & (scan["odom_reset_id"] == state.vins_reset_id) & sane
        )

        def use_vins(_):
            def have_last(_):
                # incremental application of the VINS delta
                t0, q0 = _x6_to_tq(state.x6)
                tn, qn = lie.se3_compose(t0, q0, ti_v, qi_v)
                return _tq_to_x6(tn, qn)

            def no_last(_):
                return state.x6

            x6 = jax.lax.cond(state.last_vins_valid, have_last, no_last, None)
            return x6, jnp.array(True), scan["odom_trans"], scan["odom_quat"], state.vins_reset_id

        def use_imu(_):
            def have_imu(_):
                q_last = lie.rpy_to_quat(
                    state.last_imu_rpy[0], state.last_imu_rpy[1], state.last_imu_rpy[2]
                )
                q_now = lie.rpy_to_quat(imu_rpy[0], imu_rpy[1], imu_rpy[2])
                qi = lie.quat_multiply(lie.quat_conjugate(q_last), q_now)
                # constant-velocity translation guess from the previous
                # scan-match delta (rotation from the IMU increment)
                ti = jnp.where(
                    params.constantVelocityGuess, state.last_delta_t, 0.0
                )
                t0, q0 = _x6_to_tq(state.x6)
                tn, qn = lie.se3_compose(t0, q0, ti, qi)
                return _tq_to_x6(tn, qn)

            x6 = jax.lax.cond(imu_ok & state.last_imu_valid, have_imu, lambda _: state.x6, None)
            # keep tracking the VINS pose even when its guess was rejected
            # (gate or reset-id): the next delta rebases on fresh odometry
            return (
                x6, jnp.array(False),
                jnp.where(odom_ok, scan["odom_trans"], state.last_vins_trans),
                jnp.where(odom_ok, scan["odom_quat"], state.last_vins_quat),
                scan["odom_reset_id"],
            )

        return jax.lax.cond(vins_usable, use_vins, use_imu, None)

    x6, vins_valid, vins_t, vins_q, reset_id = jax.lax.cond(
        state.kf_count == 0, first_frame, later_frame, None
    )
    return state._replace(
        x6=x6,
        last_vins_valid=vins_valid,
        last_vins_trans=vins_t,
        last_vins_quat=vins_q,
        vins_reset_id=reset_id,
        last_imu_rpy=jnp.where(imu_ok, imu_rpy, state.last_imu_rpy),
        last_imu_valid=imu_ok | state.last_imu_valid,
        last_scan_stamp=jnp.asarray(scan["stamp"], jnp.float32),
    )


def _assemble_local_map(state: LioMapState, caps: LioCaps, params: LioParams, scan_time):
    """`extractNearby` + `extractCloud` (`mapOptimization.cpp:894-970`)."""
    K = caps.max_keyframes
    cur_t = state.x6[3:6]
    kf_idx = jnp.arange(K)
    kf_ok = kf_idx < state.kf_count
    d = jnp.linalg.norm(state.kf_trans - cur_t[None, :], axis=-1)
    recent = (scan_time - state.kf_time) < 10.0
    in_radius = d < params.surroundingKeyframeSearchRadius
    eligible = kf_ok & (in_radius | recent)
    # nearest `sel_keyframes` eligible keyframes
    score = jnp.where(eligible, -d, -jnp.inf)
    _, sel = jax.lax.top_k(score, caps.sel_keyframes)
    sel_ok = eligible[sel]

    def gather(cloud, cvalid):
        pts = cloud[sel]  # (Sel, C, 3)
        val = cvalid[sel] & sel_ok[:, None]
        t = state.kf_trans[sel]
        q = state.kf_quat[sel]
        world = lie.quat_rotate(q[:, None, :], pts) + t[:, None, :]
        return world.reshape(-1, 3), val.reshape(-1)

    c_pts, c_val = gather(state.kf_corner, state.kf_corner_valid)
    s_pts, s_val = gather(state.kf_surf, state.kf_surf_valid)
    mc, mc_val, _ = pc.voxel_downsample(
        c_pts, c_val, params.mappingCornerLeafSize, caps.map_corner
    )
    ms, ms_val, _ = pc.voxel_downsample(
        s_pts, s_val, params.mappingSurfLeafSize, caps.map_surf
    )
    return mc, mc_val, ms, ms_val


def _transform_update(state: LioMapState, scan, params: LioParams, x6):
    """IMU roll/pitch slerp + clamps (`transformUpdate`, `:1345-1385`)."""
    imu_ok = scan["imu_available"] & (jnp.abs(scan["imu_rpy_init"][1]) < 1.4)
    w = params.imuRPYWeight

    def slerp_angle(a, b):
        # slerp between single-axis rotations == shortest-path angle lerp
        diff = jnp.arctan2(jnp.sin(b - a), jnp.cos(b - a))
        return a + w * diff

    roll = jnp.where(imu_ok, slerp_angle(x6[0], scan["imu_rpy_init"][0]), x6[0])
    pitch = jnp.where(imu_ok, slerp_angle(x6[1], scan["imu_rpy_init"][1]), x6[1])
    roll = jnp.clip(roll, -params.rotation_tollerance, params.rotation_tollerance)
    pitch = jnp.clip(pitch, -params.rotation_tollerance, params.rotation_tollerance)
    z = jnp.clip(x6[5], -params.z_tollerance, params.z_tollerance)
    return x6.at[0].set(roll).at[1].set(pitch).at[5].set(z)


def _is_keyframe(state: LioMapState, params: LioParams, scan_time, is_livox: bool):
    """`saveFrame` (`:1387-1412`)."""
    def first(_):
        return jnp.array(True)

    def later(_):
        last = state.kf_count - 1
        livox_force = jnp.array(is_livox) & (
            (scan_time - state.kf_time[last]) > params.livox_keyframe_interval
        )
        t0, q0 = state.kf_trans[last], state.kf_quat[last]
        t1, q1 = _x6_to_tq(state.x6)
        ti, qi = lie.se3_relative(t0, q0, t1, q1)
        rpy = jnp.abs(
            lie.matrix_to_ypr(lie.quat_to_matrix(qi)) * (jnp.pi / 180.0)
        )
        small = (
            (rpy < params.keyframeAddingAngleThreshold).all()
            & (jnp.linalg.norm(ti) < params.keyframeAddingDistThreshold)
        )
        return livox_force | (~small)

    return jax.lax.cond(state.kf_count == 0, first, later, None)


def _add_keyframe(state: LioMapState, feats: FeatureResult, caps: LioCaps,
                  params: LioParams, scan_time):
    """`saveKeyFramesAndFactor` without the solve (`:1529-1613`): push the
    keyframe + odometry factor; the optimize happens in `_maybe_optimize`."""
    k = state.kf_count
    t, q = _x6_to_tq(state.x6)

    # downsample the scan features into keyframe storage
    c_xyz, c_val, _ = pc.voxel_downsample(
        feats.corner_xyz, feats.corner_valid, params.mappingCornerLeafSize, caps.kf_corner
    )
    s_xyz, s_val, _ = pc.voxel_downsample(
        feats.surf_xyz, feats.surf_valid, params.mappingSurfLeafSize, caps.kf_surf
    )

    g = state.graph

    def first(g):
        g = g._replace(
            prior_trans=t,
            prior_quat=q,
            prior_sqrtw=jnp.array(pg.PRIOR_SQRTW, dtype=t.dtype),
        )
        return g

    def later(g):
        # between factor k-1 -> k from the *graph* pose of k-1 to the new pose
        tp, qp = g.trans[k - 1], g.quat[k - 1]
        ti, qi = lie.se3_relative(tp, qp, t, q)
        f = k - 1  # odometry factor index = source node
        g = g._replace(
            bf_i=g.bf_i.at[f].set(k - 1),
            bf_j=g.bf_j.at[f].set(k),
            bf_trans=g.bf_trans.at[f].set(ti),
            bf_quat=g.bf_quat.at[f].set(qi),
            bf_sqrtw=g.bf_sqrtw.at[f].set(jnp.array(pg.ODOM_SQRTW, dtype=t.dtype)),
            bf_valid=g.bf_valid.at[f].set(True),
        )
        return g

    g = jax.lax.cond(k == 0, first, later, g)
    g = g._replace(
        trans=g.trans.at[k].set(t),
        quat=g.quat.at[k].set(q),
        node_valid=g.node_valid.at[k].set(True),
    )

    # first-order propagation of the newest pose's worst-axis x/y marginal
    # variance (the iSAM marginal the reference gates GPS on — it skips GPS
    # only while BOTH (3,3) and (4,4) are below threshold,
    # `mapOptimization.cpp:1437-1445`, so the max axis is the gate
    # quantity). Successive hops share the same yaw error at the last
    # absolute fix, so lateral variance grows QUADRATICALLY with travelled
    # distance: track the yaw-position cross term c and propagate
    #   cov <- cov + odom_var + 2*step*c + step^2*yaw_var,  c <- c + step*yaw_var
    # which telescopes to d^2*yaw_var for straight-line motion — validated
    # against the exact dense marginal (`posegraph.dense_marginal_covariance`)
    # in tests/test_gps.py. Odometry variances from `mapOptimization.cpp:
    # 1422` (1e-6 rad^2, 1e-4 m^2). GPS factors collapse cov and c back
    # (`_add_gps_factor_impl`).
    step = jnp.sqrt(jnp.sum((t - state.kf_trans[jnp.maximum(k - 1, 0)]) ** 2))
    yaw_var2 = jnp.where(k == 0, state.yaw_var, state.yaw_var + 1e-6)
    cross2 = jnp.where(
        k == 0, state.pose_cov_cross,
        state.pose_cov_cross + step * yaw_var2,
    )
    cov2 = jnp.where(
        k == 0, state.pose_cov_xy,
        state.pose_cov_xy + 1e-4
        + 2.0 * step * state.pose_cov_cross + step**2 * yaw_var2,
    )

    cov2 = jnp.minimum(cov2, 1e8)
    cross2 = jnp.minimum(cross2, 1e8)
    return state._replace(
        graph=g,
        pose_cov_xy=cov2,
        yaw_var=yaw_var2,
        pose_cov_cross=cross2,
        kf_cov_xy=state.kf_cov_xy.at[k].set(cov2),
        kf_yaw_var=state.kf_yaw_var.at[k].set(yaw_var2),
        kf_cov_cross=state.kf_cov_cross.at[k].set(cross2),
        kf_trans=state.kf_trans.at[k].set(t),
        kf_quat=state.kf_quat.at[k].set(q),
        kf_time=state.kf_time.at[k].set(scan_time),
        kf_corner=state.kf_corner.at[k].set(c_xyz),
        kf_corner_valid=state.kf_corner_valid.at[k].set(c_val),
        kf_surf=state.kf_surf.at[k].set(s_xyz),
        kf_surf_valid=state.kf_surf_valid.at[k].set(s_val),
        kf_count=k + 1,
    )


def _claim_new_leaves(occ: jax.Array, pts: jax.Array, valid: jax.Array, leaf):
    """Leaf-voxel dedup for incremental map growth: returns
    (occ', new_ok, slot, tag) where new_ok marks the first point of each
    not-yet-claimed leaf voxel (it becomes the leaf's map row; later
    observations fold into its running centroid). Slot collisions between
    distinct leaves resolve by tag overwrite — the displaced leaf may
    re-admit a duplicate later, bounded by the rebuild interval."""
    Tl = occ.shape[0]
    N = pts.shape[0]
    c = jnp.floor(pts / leaf).astype(jnp.int32)
    slot = vh._slot(c[:, 0], c[:, 1], c[:, 2], Tl)
    tag = vh._tag(c[:, 0], c[:, 1], c[:, 2])  # int32 in [0, 2047]
    # within-batch first-of-leaf via one small sort over (slot, tag)
    key = jnp.where(valid, slot * 2048 + tag, jnp.int32(2 ** 30))
    order = jnp.argsort(key)
    ks = key[order]
    first_sorted = jnp.concatenate(
        [jnp.ones(1, bool), ks[1:] != ks[:-1]]
    ) & (ks < 2 ** 30)
    first = jnp.zeros(N, bool).at[order].set(first_sorted)
    unclaimed = occ[slot] != tag.astype(jnp.int16)
    new_ok = valid & first & unclaimed
    occ = occ.at[jnp.where(new_ok, slot, Tl)].set(
        tag.astype(jnp.int16), mode="drop"
    )
    return occ, new_ok, slot, tag


def _append_map_points(map_pts, map_valid, n, pts_w, ok, capacity: int):
    """Scatter-append `ok` points at rows [n, n+sum(ok)); overflow drops."""
    pos = n + jnp.cumsum(ok.astype(jnp.int32)) - 1
    ok = ok & (pos < capacity)
    dst = jnp.where(ok, pos, capacity)
    map_pts = map_pts.at[dst].set(
        jnp.where(ok[:, None], pts_w, 0.0), mode="drop"
    )
    map_valid = map_valid.at[dst].set(True, mode="drop")
    return map_pts, map_valid, n + jnp.sum(ok.astype(jnp.int32)), dst, ok


def _incremental_centroid_update(
    map_pts, map_valid, n, accum, cnt, occ, leaf_row,
    pts_w, valid, leaf, capacity: int,
):
    """One feature class of `_incremental_map_update`: leaf-claim, append
    first-of-new-leaf points, then fold EVERY observation into its leaf's
    running centroid (scatter-add sums/counts, re-centroid the rows).
    Returns (map_pts, map_valid, n, accum, cnt, occ, leaf_row, ins_pts,
    ins_ok, ins_dst) — the ins_* describing the appended rows for the
    spatial-hash insert."""
    occ2, new_ok, slot, tag = _claim_new_leaves(occ, pts_w, valid, leaf)
    map_pts, map_valid, n2, dst, kept = _append_map_points(
        map_pts, map_valid, n, pts_w, new_ok, capacity
    )
    # register the appended rows; capacity-dropped claims release their
    # leaf (occ reverts to unclaimed) so they can't poison later centroids
    occ2 = jnp.where(
        jnp.zeros_like(occ2, bool).at[
            jnp.where(new_ok & ~kept, slot, occ2.shape[0])
        ].set(True, mode="drop"),
        occ, occ2,
    )
    leaf_row = leaf_row.at[jnp.where(kept, slot, leaf_row.shape[0])].set(
        dst, mode="drop"
    )
    # running centroid: every valid observation whose leaf has a registered
    # row (including the just-appended firsts) contributes
    row = leaf_row[slot]
    contrib = valid & (occ2[slot] == tag.astype(jnp.int16)) & (row >= 0)
    row = jnp.where(contrib, row, capacity)
    accum = accum.at[row].add(jnp.where(contrib[:, None], pts_w, 0.0),
                              mode="drop")
    cnt = cnt.at[row].add(contrib.astype(cnt.dtype), mode="drop")
    map_pts = jnp.where((cnt > 0)[:, None], accum / jnp.maximum(cnt, 1.0)[:, None],
                        map_pts)
    return map_pts, map_valid, n2, accum, cnt, occ2, leaf_row, dst, kept


def _incremental_map_update(state: LioMapState, caps: LioCaps, params: LioParams):
    """O(new-points) local-map growth for a non-rebuild keyframe: transform
    the just-stored keyframe cloud to world, fold it into the map's running
    per-leaf centroids (new leaves append; occupied leaves re-centroid),
    and scatter-insert the appended rows into the hashes
    (`ops.voxel_hash.insert`). Replaces the reference's per-keyframe
    extractNearby/extractCloud re-downsample (`mapOptimization.cpp:894-970`)
    between full rebuilds, INCLUDING its union-centroid averaging of
    overlapping keyframe clouds (the accuracy-critical part — see
    LioMapState.leaf_row_* note)."""
    k = state.kf_count - 1
    t, q = state.kf_trans[k], state.kf_quat[k]
    cw = lie.quat_rotate(q[None, :], state.kf_corner[k]) + t[None, :]
    sw = lie.quat_rotate(q[None, :], state.kf_surf[k]) + t[None, :]
    c_val = state.kf_corner_valid[k]
    s_val = state.kf_surf_valid[k]

    mc, mc_val, nc, acc_c, cnt_c, occ_c, lr_c, dst_c, ok_c = (
        _incremental_centroid_update(
            state.map_corner, state.map_corner_valid, state.map_corner_n,
            state.map_corner_accum, state.map_corner_cnt,
            state.leaf_occ_corner, state.leaf_row_corner,
            cw, c_val, params.mappingCornerLeafSize, caps.map_corner,
        )
    )
    ms, ms_val, ns, acc_s, cnt_s, occ_s, lr_s, dst_s, ok_s = (
        _incremental_centroid_update(
            state.map_surf, state.map_surf_valid, state.map_surf_n,
            state.map_surf_accum, state.map_surf_cnt,
            state.leaf_occ_surf, state.leaf_row_surf,
            sw, s_val, params.mappingSurfLeafSize, caps.map_surf,
        )
    )
    return state._replace(
        map_corner=mc, map_corner_valid=mc_val, map_corner_n=nc,
        map_surf=ms, map_surf_valid=ms_val, map_surf_n=ns,
        map_corner_accum=acc_c, map_corner_cnt=cnt_c,
        map_surf_accum=acc_s, map_surf_cnt=cnt_s,
        leaf_occ_corner=occ_c, leaf_occ_surf=occ_s,
        leaf_row_corner=lr_c, leaf_row_surf=lr_s,
        # hash rows hold the first observation's (quantized cell-relative)
        # position; later centroid motion stays inside the leaf, so
        # selection error is bounded by the leaf size and the GN
        # coefficients re-gather the exact refreshed rows by index
        corner_hash=vh.insert(state.corner_hash, cw, ok_c, dst_c),
        surf_hash=vh.insert(state.surf_hash, sw, ok_s, dst_s),
        kf_since_rebuild=state.kf_since_rebuild + 1,
    )


def _full_map_rebuild(state: LioMapState, caps: LioCaps, params: LioParams,
                      scan_time, track_incremental: bool):
    """The reference-exact path: re-assemble + re-downsample the local map
    and rebuild both hashes; resets the incremental bookkeeping."""
    mc, mc_val, ms, ms_val = _assemble_local_map(state, caps, params, scan_time)
    state = state._replace(
        map_corner=mc, map_corner_valid=mc_val,
        map_surf=ms, map_surf_valid=ms_val,
        corner_hash=vh.build(mc, mc_val, 1.0, caps.corner_hash_size,
                             caps.hash_bucket),
        surf_hash=vh.build(ms, ms_val, 1.0, caps.surf_hash_size,
                           caps.surf_hash_bucket),
    )
    if not track_incremental:
        return state
    occ_c, ok_c, slot_c, _ = _claim_new_leaves(
        jnp.full(caps.corner_leaf_table, -1, jnp.int16), mc, mc_val,
        params.mappingCornerLeafSize,
    )
    occ_s, ok_s, slot_s, _ = _claim_new_leaves(
        jnp.full(caps.surf_leaf_table, -1, jnp.int16), ms, ms_val,
        params.mappingSurfLeafSize,
    )
    # rebuilt rows restart their running centroids at weight 1 (the rebuild
    # already centroided the keyframe union); leaf->row maps point at the
    # compacted rows (voxel_downsample emits valid rows front-compacted)
    lr_c = jnp.full(caps.corner_leaf_table, -1, jnp.int32).at[
        jnp.where(ok_c, slot_c, caps.corner_leaf_table)
    ].set(jnp.arange(caps.map_corner), mode="drop")
    lr_s = jnp.full(caps.surf_leaf_table, -1, jnp.int32).at[
        jnp.where(ok_s, slot_s, caps.surf_leaf_table)
    ].set(jnp.arange(caps.map_surf), mode="drop")
    return state._replace(
        map_corner_n=jnp.sum(mc_val.astype(jnp.int32)),
        map_surf_n=jnp.sum(ms_val.astype(jnp.int32)),
        kf_since_rebuild=jnp.int32(0),
        leaf_occ_corner=occ_c, leaf_occ_surf=occ_s,
        leaf_row_corner=lr_c, leaf_row_surf=lr_s,
        map_corner_accum=jnp.where(mc_val[:, None], mc, 0.0),
        map_corner_cnt=mc_val.astype(state.map_corner_cnt.dtype),
        map_surf_accum=jnp.where(ms_val[:, None], ms, 0.0),
        map_surf_cnt=ms_val.astype(state.map_surf_cnt.dtype),
    )


def _maybe_optimize(state: LioMapState):
    """When loop/GPS factors are pending, run the batch solve and rewrite all
    keyframe poses (`correctPoses`, `:1615-1646`). Without pending factors
    the chain solution is exact already (odometry factors are consistent by
    construction), matching iSAM2's no-op update."""

    def do_opt(state):
        g = pg.optimize(state.graph, gn_iters=6, pcg_iters=96)
        k = state.kf_count - 1
        new_x6 = _tq_to_x6(g.trans[k], g.quat[k])
        return state._replace(
            graph=g,
            kf_trans=jnp.where(g.node_valid[:, None], g.trans, state.kf_trans),
            kf_quat=jnp.where(g.node_valid[:, None], g.quat, state.kf_quat),
            x6=new_x6,
            loop_pending=jnp.array(False),
        )

    return jax.lax.cond(state.loop_pending, do_opt, lambda s: s, state)


@partial(jax.jit, static_argnames=("caps", "params", "is_livox", "max_gn_iters"))
def map_step(
    state: LioMapState,
    scan: dict,
    feats: FeatureResult,
    caps: LioCaps,
    params: LioParams,
    is_livox: bool = True,
    max_gn_iters: int = 20,
):
    """One `laserCloudInfoHandler` step (`mapOptimization.cpp:298-332`)."""
    incr_front = state.x6
    state = _update_initial_guess(state, scan, params)

    # downsample current scan (`downsampleCurrentScan`)
    c_xyz, c_val, _ = pc.voxel_downsample(
        feats.corner_xyz, feats.corner_valid, params.mappingCornerLeafSize, caps.scan_corner
    )
    s_xyz, s_val, _ = pc.voxel_downsample(
        feats.surf_xyz, feats.surf_valid, params.mappingSurfLeafSize, caps.scan_surf
    )

    # cached local map (rebuilt on keyframe insertion below)
    mc, mc_val = state.map_corner, state.map_corner_valid
    ms, ms_val = state.map_surf, state.map_surf_valid

    enough = (jnp.sum(c_val) > params.edgeFeatureMinValidNum) & (
        jnp.sum(s_val) > params.surfFeatureMinValidNum
    )
    have_map = state.kf_count > 0

    def run_gn(x6):
        st = scan2map.scan_to_map_hashed(
            x6, c_xyz, c_val, s_xyz, s_val, mc, ms,
            state.corner_hash, state.surf_hash,
            max_iters=max_gn_iters,
            eigen_thresh=params.degeneracyEigenThreshold,
            nn_refresh_every=params.nnRefreshEvery,
            use_pallas=caps.pallas_knn,
            gather_once=params.gatherOncePerScan and caps.pallas_knn,
            use_pallas_gn=caps.pallas_gn,
        )
        return st.x6, st.degenerate, st.num_residuals, st.it

    def skip_gn(x6):
        return x6, jnp.array(False), jnp.int32(0), jnp.int32(0)

    x6_new, degen, n_res, gn_iters = jax.lax.cond(
        enough & have_map, run_gn, skip_gn, state.x6
    )
    x6_new = _transform_update(state, scan, params, x6_new)
    state = state._replace(
        x6=x6_new, degenerate=degen,
        last_gn_ok=(gn_iters > 0) & (n_res >= 50) & (~degen),
    )

    # incremental odometry: pure scan-match delta chain (`publishOdometry`,
    # `:1711-1746`: incrementalOdometryAffineFront^-1 * Back composed onto
    # the previous incremental pose)
    tf, qf = _x6_to_tq(incr_front)
    tb, qb = _x6_to_tq(x6_new)
    ti, qi = lie.se3_relative(tf, qf, tb, qb)
    tp, qp = _x6_to_tq(state.incr_x6)
    tn, qn = lie.se3_compose(tp, qp, ti, qi)
    incr_x6 = jnp.where(state.kf_count == 0, x6_new, _tq_to_x6(tn, qn))
    state = state._replace(
        incr_x6=incr_x6, last_delta_t=ti, last_delta_q=qi
    )

    # saturate at capacity: beyond max_keyframes the map freezes (no new
    # keyframes/factors) but odometry keeps running against the frozen local
    # map — graceful degradation instead of the silent last-slot overwrite
    # an unguarded `.at[k]` would do (XLA clamps out-of-bounds scatter)
    is_kf = _is_keyframe(state, params, scan["stamp"], is_livox)
    is_kf &= state.kf_count < caps.max_keyframes

    def with_kf(state):
        state = _add_keyframe(state, feats, caps, params, scan["stamp"])
        # GPS factor between keyframe insert and the solve — the reference's
        # addOdomFactor -> addGPSFactor -> optimize order (`:1540-1551`)
        if "gps_available" in scan:
            state = jax.lax.cond(
                scan["gps_available"],
                lambda s: _add_gps_factor_impl(
                    s, scan["gps_pos"], scan["gps_noise"],
                    scan["gps_use_elevation"], params),
                lambda s: s, state,
            )
        corrected = state.loop_pending  # poses move in the optimize below
        state = _maybe_optimize(state)
        if params.mapRebuildEvery <= 1:
            # reference-exact: re-assemble + re-downsample every keyframe
            return _full_map_rebuild(
                state, caps, params, scan["stamp"], track_incremental=False
            )
        force_full = (
            corrected
            | (state.kf_since_rebuild + 1 >= params.mapRebuildEvery)
            | (state.map_corner_n + caps.kf_corner > caps.map_corner)
            | (state.map_surf_n + caps.kf_surf > caps.map_surf)
        )
        return jax.lax.cond(
            force_full,
            lambda s: _full_map_rebuild(
                s, caps, params, scan["stamp"], track_incremental=True
            ),
            lambda s: _incremental_map_update(s, caps, params),
            state,
        )

    state = jax.lax.cond(is_kf, with_kf, lambda s: s, state)

    return state, MapOutputs(
        x6=state.x6,
        incr_x6=incr_x6,
        degenerate=degen,
        is_keyframe=is_kf,
        num_residuals=n_res,
        gn_iters=gn_iters,
    )


def _add_gps_factor_impl(
    state: LioMapState,
    gps_pos: jax.Array,  # (3,) GPS position in the map frame
    gps_noise: jax.Array,  # (3,) position variances
    use_elevation,  # () bool (traced or python)
    params: LioParams,
):
    """`addGPSFactor` (`mapOptimization.cpp:1433-1507`): unary position
    factor on the newest keyframe. Gates reproduced:

    - pose-covariance need: the newest pose's x/y marginal >=
      poseCovThreshold (`:1437-1445`, iSAM marginalCovariance(3,3)/(4,4)) —
      here the first-order propagated proxy `state.pose_cov_xy` (see
      `_add_keyframe`), which starts at the prior's free-position 1e8,
      grows with odometry noise + yaw leverage, and collapses to the GPS
      noise when a factor is applied;
    - system settled: distance first->last keyframe >= 5 m (`:1459-1461`);
    - GPS quality: x/y variance <= gpsCovThreshold (`:1466-1470`);
    - GPS spacing: >= 5 m from the last APPLIED GPS point (`:1477-1482`);
    - noise floor 1.0 (`:1484-1496`), optional elevation (`:1487-1491`)."""
    k = state.kf_count - 1
    g = state.graph
    noise = jnp.maximum(gps_noise, 1.0)  # (`:1496` floor at 1.0)
    z = jnp.where(use_elevation, gps_pos[2], state.kf_trans[k, 2])
    nz = jnp.where(use_elevation, noise[2], 0.01)
    pos = jnp.concatenate([gps_pos[:2], z[None]])
    sqrtw = 1.0 / jnp.sqrt(jnp.concatenate([noise[:2], nz[None]]))

    ok = (state.pose_cov_xy >= params.poseCovThreshold) & (
        state.kf_count > 0
    ) & (
        jnp.linalg.norm(state.kf_trans[0] - state.kf_trans[k]) >= 5.0
    ) & (gps_noise[0] <= params.gpsCovThreshold) & (
        gps_noise[1] <= params.gpsCovThreshold
    ) & ((~state.has_gps) | (jnp.linalg.norm(pos - state.last_gps_pos) >= 5.0))

    slot = jnp.argmin(g.up_valid)  # first free unary slot

    def add(state):
        g2 = g._replace(
            up_k=g.up_k.at[slot].set(k),
            up_pos=g.up_pos.at[slot].set(pos),
            up_sqrtw=g.up_sqrtw.at[slot].set(sqrtw),
            up_valid=g.up_valid.at[slot].set(True),
        )
        # the applied factor collapses the newest pose's x/y marginal to
        # ~the GPS noise (worst axis — the gate reads (3,3)/(4,4)
        # individually) and decorrelates it from yaw (cross -> 0); a PAIR
        # of fixes separated by d also constrains yaw to ~2*var/d^2 (the
        # mechanism by which iSAM's marginals keep shrinking as fixes
        # accumulate)
        xy_var = jnp.maximum(noise[0], noise[1])
        d2 = jnp.sum((pos - state.last_gps_pos) ** 2)
        yaw2 = jnp.where(
            state.has_gps,
            jnp.minimum(state.yaw_var, 2.0 * xy_var / jnp.maximum(d2, 1.0)),
            state.yaw_var,
        )
        return state._replace(
            graph=g2, loop_pending=jnp.array(True),
            last_gps_pos=pos, has_gps=jnp.array(True),
            n_gps=state.n_gps + 1,
            pose_cov_xy=xy_var, yaw_var=yaw2,
            pose_cov_cross=jnp.zeros_like(state.pose_cov_cross),
            # refresh the newest keyframe's snapshot (the fix lands on it)
            kf_cov_xy=state.kf_cov_xy.at[k].set(xy_var),
            kf_yaw_var=state.kf_yaw_var.at[k].set(yaw2),
            kf_cov_cross=state.kf_cov_cross.at[k].set(0.0),
        )

    return jax.lax.cond(ok & (~g.up_valid[slot]), add, lambda s: s, state)


@partial(jax.jit, static_argnames=("caps", "params"))
def add_gps_factor(
    state: LioMapState,
    gps_pos: jax.Array,
    gps_noise: jax.Array,
    use_elevation: bool,
    caps: LioCaps,
    params: LioParams,
):
    """Standalone jitted entry for hosts that apply GPS outside `map_step`
    (the in-step path is `scan["gps_available"/"gps_pos"/"gps_noise"/
    "gps_use_elevation"]`, applied between keyframe insert and optimize
    exactly like the reference's factor order)."""
    return _add_gps_factor_impl(state, gps_pos, gps_noise, use_elevation, params)


# ---------------------------------------------------------------------------
# Loop closure (`loopClosureThread`, `mapOptimization.cpp:523-741`)
# ---------------------------------------------------------------------------

class LoopResult(NamedTuple):
    found: jax.Array  # () bool
    kf_from: jax.Array  # () int32 (current keyframe)
    kf_to: jax.Array  # () int32 (old keyframe)
    fitness: jax.Array  # ()


def _loop_icp(state: LioMapState, cur, cand, caps: LioCaps, params: LioParams):
    """Submap ICP verification + loop factor insertion for an explicit
    (cur, cand) keyframe pair (`performLoopClosure`, `:549-628`)."""
    K = caps.max_keyframes
    cur_t = state.kf_trans[cur]

    def do_icp(state):
        # source: current keyframe surf+corner cloud (lidar frame -> world at
        # current pose); target: ±historyKeyframeSearchNum submap around cand
        src = jnp.concatenate([state.kf_corner[cur], state.kf_surf[cur]], axis=0)
        srcv = jnp.concatenate(
            [state.kf_corner_valid[cur], state.kf_surf_valid[cur]], axis=0
        )
        src_w = lie.quat_rotate(state.kf_quat[cur][None, :], src) + cur_t[None, :]

        n_sub = 2 * params.historyKeyframeSearchNum + 1
        offs = jnp.arange(n_sub) - params.historyKeyframeSearchNum
        sub_idx = jnp.clip(cand + offs, 0, K - 1)
        sub_ok = (sub_idx >= 0) & (sub_idx < state.kf_count)
        t = state.kf_trans[sub_idx]
        q = state.kf_quat[sub_idx]
        # target submap stacks CORNER + surf clouds (`loopFindNearKeyframes`,
        # `mapOptimization.cpp:694-702`): in corridor-like geometry the edge
        # features are what lock translation along the corridor axis — a
        # surf-only target lets point-to-point ICP slide along it
        sub_s = state.kf_surf[sub_idx]  # (n_sub, S, 3)
        sub_sv = state.kf_surf_valid[sub_idx] & sub_ok[:, None]
        sub_c = state.kf_corner[sub_idx]  # (n_sub, C, 3)
        sub_cv = state.kf_corner_valid[sub_idx] & sub_ok[:, None]
        tgt_s = lie.quat_rotate(q[:, None, :], sub_s) + t[:, None, :]
        tgt_c = lie.quat_rotate(q[:, None, :], sub_c) + t[:, None, :]
        tgt = jnp.concatenate([tgt_c.reshape(-1, 3), tgt_s.reshape(-1, 3)])
        tgtv = jnp.concatenate([sub_cv.reshape(-1), sub_sv.reshape(-1)])
        # center=cand pose: on capacity overflow keep the voxels nearest the
        # candidate — a key-ordered drop keeps a spatially biased slab and
        # ICP then sees a target with no overlap (fitness ~5 m on honest
        # revisits; found by the fused loop test)
        cand_t = state.kf_trans[cand]
        tgt_ds, tgt_val, _ = pc.voxel_downsample(
            tgt, tgtv, params.mappingSurfLeafSize, caps.loop_submap,
            center=cand_t,
        )
        # PCL's fitness is over an UNBOUNDED submap; ours is capacity-bound.
        # Source points beyond the kept submap's coverage radius have no
        # possible correspondence — capacity artifacts, not misalignment —
        # so exclude them from the ICP/fitness (no-op when unsaturated:
        # r_cov then spans the full ±N-keyframe submap).
        d_tgt = jnp.linalg.norm(tgt_ds - cand_t[None, :], axis=-1)
        r_cov = jnp.max(jnp.where(tgt_val, d_tgt, 0.0)) - params.mappingSurfLeafSize
        srcv = srcv & (
            jnp.linalg.norm(src_w - cand_t[None, :], axis=-1) <= r_cov
        )

        res = icp_ops.icp_point2point(
            src_w, srcv, tgt_ds, tgt_val,
            jnp.zeros(3, src.dtype), lie.quat_identity(src.dtype),
            max_corr_dist=params.historyKeyframeSearchRadius * 2.0,
            iters=caps.icp_iters,
        )
        good = res.fitness < params.historyKeyframeFitnessScore

        def add_factor(state):
            # corrected current pose: T_corr = ICP ∘ T_cur
            t_cor, q_cor = lie.se3_compose(
                res.trans, res.quat, cur_t, state.kf_quat[cur]
            )
            # between: T_cand^-1 ∘ T_corr  (pose_from=cand … wait: reference
            # uses poseFrom=corrected current, poseTo=cand, factor cur->cand)
            ti, qi = lie.se3_relative(
                t_cor, q_cor, state.kf_trans[cand], state.kf_quat[cand]
            )
            noise = jnp.maximum(res.fitness, 1e-6)
            sqrtw = jnp.full((6,), 1.0, src.dtype) / jnp.sqrt(noise)
            f = K + state.n_loops  # loop slots live after the K-1 odom slots
            g = state.graph
            g = g._replace(
                bf_i=g.bf_i.at[f].set(cur),
                bf_j=g.bf_j.at[f].set(cand),
                bf_trans=g.bf_trans.at[f].set(ti),
                bf_quat=g.bf_quat.at[f].set(qi),
                bf_sqrtw=g.bf_sqrtw.at[f].set(sqrtw),
                bf_valid=g.bf_valid.at[f].set(True),
            )
            # the loop re-anchors `cur` to `cand`: the newest pose's
            # marginal collapses to ~the anchor keyframe's snapshot + the
            # ICP noise + the yaw leverage over the relative baseline
            # (|t_rel|^2 * yaw — for a genuine revisit t_rel is small and
            # the lever vanishes; validated against the exact dense
            # marginal in tests/test_gps.py; matches iSAM's marginal drop
            # after the loop factor, `mapOptimization.cpp:1437-1445`)
            yaw_l = jnp.minimum(
                state.yaw_var, state.kf_yaw_var[cand] + noise)
            lever2 = jnp.sum(ti**2)
            cov_l = jnp.minimum(
                state.pose_cov_xy,
                state.kf_cov_xy[cand] + noise + lever2 * yaw_l)
            cross_l = jnp.minimum(
                state.pose_cov_cross,
                state.kf_cov_cross[cand] + jnp.sqrt(lever2) * yaw_l)
            return state._replace(
                graph=g,
                n_loops=state.n_loops + 1,
                loop_pending=jnp.array(True),
                last_loop_kf=cur,
                pose_cov_xy=cov_l, yaw_var=yaw_l, pose_cov_cross=cross_l,
                kf_cov_xy=state.kf_cov_xy.at[cur].set(cov_l),
                kf_yaw_var=state.kf_yaw_var.at[cur].set(yaw_l),
                kf_cov_cross=state.kf_cov_cross.at[cur].set(cross_l),
            )

        state = jax.lax.cond(
            good & (state.n_loops < caps.max_loops), add_factor, lambda s: s, state
        )
        return state, LoopResult(found=good, kf_from=cur, kf_to=cand, fitness=res.fitness)

    return do_icp(state)


@partial(jax.jit, static_argnames=("caps", "params"))
def loop_closure_step(state: LioMapState, caps: LioCaps, params: LioParams):
    """Distance-based candidate search + submap ICP
    (`detectLoopClosureDistance` `:630-663`). Returns (state, LoopResult)."""
    K = caps.max_keyframes
    cur = state.kf_count - 1
    cur_t = state.kf_trans[cur]
    cur_time = state.kf_time[cur]
    kf_idx = jnp.arange(K)
    old_ok = (kf_idx < state.kf_count) & (
        (cur_time - state.kf_time) > params.historyKeyframeSearchTimeDiff
    )
    d = jnp.linalg.norm(state.kf_trans - cur_t[None, :], axis=-1)
    cand_ok = old_ok & (d < params.historyKeyframeSearchRadius)
    cand = jnp.argmin(jnp.where(cand_ok, d, jnp.inf))
    has_cand = jnp.any(cand_ok) & (state.kf_count > 1) & (cur != state.last_loop_kf)

    def no_icp(state):
        return state, LoopResult(
            found=jnp.array(False), kf_from=cur, kf_to=jnp.int32(-1),
            fitness=jnp.float32(jnp.inf),
        )

    return jax.lax.cond(
        has_cand, lambda s: _loop_icp(s, cur, cand, caps, params), no_icp, state
    )


@partial(jax.jit, static_argnames=("caps", "params"))
def loop_closure_external(state: LioMapState, cur: jax.Array, old: jax.Array,
                          caps: LioCaps, params: LioParams):
    """External (visual) loop candidate -> same ICP verification
    (`detectLoopClosureExternal`, `mapOptimization.cpp:665-741` — here the
    channel actually works; the reference's topic names never matched)."""
    ok = (cur < state.kf_count) & (old >= 0) & (old < state.kf_count) & (cur != old)

    def no_icp(state):
        return state, LoopResult(
            found=jnp.array(False), kf_from=cur, kf_to=jnp.int32(-1),
            fitness=jnp.float32(jnp.inf),
        )

    return jax.lax.cond(
        ok, lambda s: _loop_icp(s, cur, old, caps, params), no_icp, state
    )
