"""End-to-end LIO replay on a synthetic world (BASELINE config 3: deskew +
LOAM scan-matching + factor graph, no camera): ATE must stay small, and two
replays must be bit-identical (determinism — impossible for the
multi-process reference, SURVEY.md §4 item 3)."""

import dataclasses

import numpy as np
import pytest

from lvislam_tpu.utils import synthetic as syn
from lvislam_tpu.models.lio import mapping
from lvislam_tpu.models.lio.pipeline import LioConfig, LioPipeline

SMALL_CAPS = mapping.LioCaps(
    max_keyframes=64,
    kf_corner=256,
    kf_surf=1024,
    sel_keyframes=16,
    map_corner=4096,
    map_surf=16384,
    scan_corner=512,
    scan_surf=2048,
    max_loops=8,
    max_gps=8,
    loop_submap=4096,
    icp_iters=10,
)


def run_lio(duration=6.0, rate=10.0, seed=0, upload_batch=1,
            async_dispatch=True, pipelined_uploads=True, **param_overrides):
    world = syn.default_world(seed=seed)
    traj = syn.figure8_trajectory(scale=3.0, period=30.0)
    cfg = LioConfig(
        n_scan=4,
        horizon=900,
        point_capacity=4096,
        caps=SMALL_CAPS,
        params=mapping.LioParams(
            surroundingKeyframeSearchRadius=50.0,
            keyframeAddingDistThreshold=0.3,
            keyframeAddingAngleThreshold=0.1,
            livox_keyframe_interval=0.5,
            degeneracyEigenThreshold=25.0,
            **param_overrides,
        ),
        loop_every_n_scans=20,
        upload_batch=upload_batch,
        async_dispatch=async_dispatch,
        pipelined_uploads=pipelined_uploads,
    )
    pipe = LioPipeline(cfg)
    imu_rate = 200.0
    t0 = 0.0
    scans = []
    gt = []
    n_scans = int(duration * rate)
    for i in range(n_scans):
        ts = t0 + i / rate
        scan = syn.simulate_lidar_scan(
            world, traj, ts, n_scan=4, horizon=900, sweep_time=1.0 / rate,
        )
        # IMU samples covering the scan
        it = np.arange(ts - 0.005, ts + 1.0 / rate + 0.01, 1.0 / imu_rate)
        w, f = traj.imu(it)
        _, R = traj.pose(np.array([ts]))
        from scipy.spatial.transform import Rotation as Rsc

        rpy = Rsc.from_matrix(R[0]).as_euler("ZYX")[::-1]  # roll, pitch, yaw
        out = pipe.process_scan(
            scan, (it - ts).astype(np.float32), w.astype(np.float32),
            np.array([rpy[0], rpy[1], rpy[2]], np.float32),
        )
        scans.append(out)
        gt.append((scan["true_pos"], scan["true_R"]))
    return pipe, scans, gt


@pytest.fixture(scope="module")
def lio_run():
    return run_lio()


def test_lio_tracks_trajectory(lio_run):
    from lvislam_tpu.utils.metrics import ate_rmse

    pipe, outs, gt = lio_run
    est = np.stack([x6 for _, x6 in pipe.trajectory])
    gt_pos = np.stack([p for p, _ in gt])
    # the map frame differs from world by the zeroed first-frame yaw
    # (useImuHeadingInitialization=False) — standard SE(3)-aligned ATE
    est_pos = est[:, 3:6]
    rmse = ate_rmse(est_pos, gt_pos, align=True)
    assert rmse < 0.12, f"ATE RMSE {rmse:.3f} m"
    assert int(pipe.state.kf_count) > 3


def test_lio_batched_upload_equivalence():
    """`upload_batch>1` (one transfer per K scans, rows indexed on device)
    must be bit-identical to per-scan uploads, in every dispatch mode:
    async RPC-worker thread, depth-1 pipelined, and plain inline. 1.5 s at
    10 Hz = 15 scans = 3 full batches of 4 + a 3-row partial flush, so the
    trailing-partial path is exercised too."""
    ref = run_lio(duration=1.5)[0].trajectory_array()
    for kw in (
        dict(async_dispatch=True),
        dict(async_dispatch=False, pipelined_uploads=True),
        dict(async_dispatch=False, pipelined_uploads=False),
    ):
        pipe, _, _ = run_lio(duration=1.5, upload_batch=4, **kw)
        np.testing.assert_array_equal(ref, pipe.trajectory_array())
        pipe.close()


def test_lio_determinism():
    pipe1, _, _ = run_lio(duration=1.5)
    pipe2, _, _ = run_lio(duration=1.5)
    t1 = np.stack([x for _, x in pipe1.trajectory])
    t2 = np.stack([x for _, x in pipe2.trajectory])
    np.testing.assert_array_equal(t1, t2)


def test_lio_incremental_map_update(lio_run):
    """`mapRebuildEvery=4` (leaf-dedup append + hash insert between full
    rebuilds) must track the same trajectory as the reference-exact
    per-keyframe rebuild within mm — the map differs only by
    first-point-wins vs centroid inside a leaf until the next rebuild."""
    from lvislam_tpu.utils.metrics import ate_rmse

    pipe_ref, _, gt = lio_run
    pipe_inc, _, _ = run_lio(mapRebuildEvery=4)
    gt_pos = np.stack([p for p, _ in gt])
    est_ref = np.stack([x for _, x in pipe_ref.trajectory])[:, 3:6]
    est_inc = np.stack([x for _, x in pipe_inc.trajectory])[:, 3:6]
    rmse_inc = ate_rmse(est_inc, gt_pos, align=True)
    rmse_ref = ate_rmse(est_ref, gt_pos, align=True)
    assert rmse_inc < 0.12, f"incremental ATE {rmse_inc:.3f} m"
    assert rmse_inc < rmse_ref + 0.03, (rmse_inc, rmse_ref)
    # the incremental path must actually have been exercised
    st = pipe_inc.state
    assert int(st.map_surf_n) > 0
