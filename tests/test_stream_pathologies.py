"""Real-data pathology robustness (VERDICT r3 #8): the tolerance the
reference gets from DDS QoS + its restart protocol (`utility.h:414-470`,
`estimator_node.cpp:268-287`), synthesized against this framework's entry
paths — out-of-order arrival, duplicated messages, inter-sensor clock
skew, and truncated CDR payloads. The pipeline must survive each with
bounded error or a clean skip, never a crash or silent corruption."""

import os
import shutil
import sqlite3
import sys

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as Rsc

sys.path.insert(0, "tests")

from lvislam_tpu.utils import synthetic as syn

DATA = os.path.join(os.path.dirname(__file__), "data")
BAG = os.path.join(DATA, "fixture_mid360.db3")


def _streams(duration=2.0, cam=False):
    world = syn.default_world(seed=0)
    traj = syn.figure8_trajectory(scale=3.0, period=30.0)
    imu_ts = (np.arange(int(duration * 200)) + 1) / 200
    w_all, f_all = traj.imu(imu_ts)
    imu = []
    for i, t in enumerate(imu_ts):
        _, R = traj.pose(np.array([t]))
        rpy = Rsc.from_matrix(R[0]).as_euler("ZYX")[::-1]
        imu.append((t, w_all[i], f_all[i], np.array(rpy, np.float32)))
    scans = []
    for i in range(int(duration * 10) - 1):
        ts = 0.05 + i / 10
        scans.append((ts, syn.simulate_lidar_scan(
            world, traj, ts, n_scan=4, horizon=900, sweep_time=0.1)))
    imgs = []
    if cam:
        for i in range(int(duration * 10) - 1):
            ts = 0.1 + i / 10
            imgs.append((ts, syn.render_camera_image(
                world, traj, ts, width=320, height=240, f=200.0)))
    return traj, imu, scans, imgs


def _feed_and_run(order=None, dup_every=None, skew_cam=0.0, cam=False,
                  duration=2.0):
    from test_lvi_system import make_system

    sys_ = make_system()
    traj, imu, scans, imgs = _streams(duration, cam=cam)
    events = (
        [("imu", e) for e in imu]
        + [("lidar", e) for e in scans]
        + [("image", e) for e in imgs]
    )
    if order == "shuffled":
        rng = np.random.default_rng(3)
        rng.shuffle(events)
    for kind, e in events:
        if kind == "imu":
            t, w, f, rpy = e
            sys_.feed_imu(t, w, f, rpy=rpy)
            if dup_every and int(t * 200) % dup_every == 0:
                sys_.feed_imu(t, w, f, rpy=rpy)  # exact duplicate
        elif kind == "lidar":
            t, s = e
            sys_.feed_lidar(t, s)
            if dup_every and int(t * 10) % dup_every == 0:
                sys_.feed_lidar(t, s)
        else:
            t, im = e
            sys_.feed_image(t + skew_cam, im)
    sys_.run()
    assert len(sys_.trajectory) >= 5
    est = np.stack([x6[3:6] for _, x6 in sys_.trajectory])
    assert np.isfinite(est).all()
    stamps = np.array([t for t, _ in sys_.trajectory])
    assert (np.diff(stamps) > 0).all(), "output stamps must stay monotone"
    return sys_, est


@pytest.mark.slow
def test_out_of_order_feed_matches_ordered():
    """The deterministic (stamp, seq) bus re-sorts out-of-order arrival —
    a fully shuffled feed must replay to the same trajectory (DDS delivers
    per-topic in order; cross-topic ordering is what the reference's
    multi-queue buffering repairs, `estimator_node.cpp` measurement
    alignment). Events sharing a stamp across topics (an IMU sample and a
    scan both at t=0.05) tie-break by ARRIVAL order — the same arbitrary
    ordering real DDS gives — so the comparison allows the mm-level
    deskew-window difference that reordering a tied pair causes, and no
    more."""
    _, est_a = _feed_and_run(order=None)
    _, est_b = _feed_and_run(order="shuffled")
    assert est_a.shape == est_b.shape
    d = np.linalg.norm(est_a - est_b, axis=1)
    assert d.max() < 0.02, d.max()


@pytest.mark.slow
def test_duplicate_messages_bounded():
    """Duplicated IMU samples and scans (a real DDS reconnect artifact)
    must not crash or blow up the estimate: the zero-dt IMU interval
    contributes nothing and the same-stamp scan is throttled/handled."""
    _, est_dup = _feed_and_run(dup_every=3)
    _, est_ref = _feed_and_run()
    n = min(len(est_dup), len(est_ref))
    # bounded divergence from the clean run (duplicates may legally shift
    # keyframe decisions slightly; they must not corrupt the solve)
    d = np.linalg.norm(est_dup[:n] - est_ref[:n], axis=1)
    assert d.max() < 0.5, d.max()


@pytest.mark.slow
def test_camera_clock_skew_survives():
    """A constant +20 ms camera clock offset (unsynchronized rig — the
    situation the reference's td estimation exists for,
    `params_camera.yaml estimate_td`) must degrade gracefully: the replay
    completes, stays finite, and the LIS trajectory stays usable."""
    sys_, est = _feed_and_run(skew_cam=0.02, cam=True, duration=2.0)
    world = syn.default_world(seed=0)
    traj = syn.figure8_trajectory(scale=3.0, period=30.0)
    gt = np.stack([traj.pose(np.array([t]))[0][0]
                   for t, _ in sys_.trajectory])
    from lvislam_tpu.utils.metrics import ate_rmse

    assert float(ate_rmse(est, gt, align=True)) < 0.25


def test_truncated_cdr_payloads_skipped(tmp_path):
    """Truncating random message payloads in a copy of the fixture bag must
    not crash the reader: corrupt rows are skipped and counted
    (`Rosbag2Reader.skipped`), every surviving row decodes."""
    from lvislam_tpu.utils.bag import Rosbag2Reader

    bag = str(tmp_path / "trunc.db3")
    shutil.copy(BAG, bag)
    conn = sqlite3.connect(bag)
    rows = conn.execute(
        "SELECT id, data FROM messages ORDER BY id").fetchall()
    rng = np.random.default_rng(0)
    vict = rng.choice(len(rows), size=max(4, len(rows) // 50), replace=False)
    n_trunc = 0
    for i in vict:
        mid, data = rows[i]
        if len(data) < 16:
            continue
        cut = int(rng.integers(4, max(5, len(data) // 2)))
        conn.execute("UPDATE messages SET data=? WHERE id=?",
                     (sqlite3.Binary(data[:cut]), mid))
        n_trunc += 1
    conn.commit()
    conn.close()
    assert n_trunc >= 3

    reader = Rosbag2Reader(bag)
    n_ok = 0
    for t, topic, kind, msg in reader:
        n_ok += 1
        if kind == "imu":
            assert np.isfinite(msg["gyro"]).all()
        elif kind == "lidar":
            assert np.isfinite(msg["xyz"]).all()
    # most rows survive; the mangled ones were counted, not fatal.
    # (some truncations still parse: the livox decoder zero-pads a short
    # point payload by design — those yield fewer points, not an error)
    assert n_ok >= len(rows) - len(vict)
    assert reader.skipped >= 1
    assert reader.skipped + n_ok <= len(rows)
