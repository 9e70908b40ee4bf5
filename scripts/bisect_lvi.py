"""Bisect the round-3 full-LVI ATE regression (VERDICT r3 item 1).

Replays the bench's exact LVI sequence (`bench.py:_lvi_section` shapes:
7 s figure-8, 320x240 pinhole, 4x900 scans, 200 Hz IMU) with an arbitrary
subset of the round-3 perf knobs toggled, and prints one JSON line with the
resulting ATE. Run on CPU (deterministic) to isolate which knob moved
0.052 -> 0.138 m.

Usage:
    JAX_PLATFORMS=cpu python scripts/bisect_lvi.py [knob ...]
knobs: throttle schur nnrefresh maprebuild gatheronce pallas
"""

from __future__ import annotations

import dataclasses as dc
import json
import sys
import time

import numpy as np
from scipy.spatial.transform import Rotation as Rsc

sys.path.insert(0, "tests")
sys.path.insert(0, ".")


def run(knobs: set[str]) -> dict:
    from test_lvi_system import make_system

    from lvislam_tpu.utils import synthetic as syn
    from lvislam_tpu.utils.metrics import ate_rmse

    s = make_system(pallas="pallas" in knobs)
    s.cfg.replay_batch = 16
    if "throttle" in knobs:
        s.cfg.mapping_process_interval = 0.15
    if "schur" in knobs:
        s.cfg.ba = dc.replace(s.cfg.ba, solver="schur")
    lio_kw = {}
    if "nnrefresh" in knobs:
        lio_kw["nnRefreshEvery"] = 2
    if "maprebuild" in knobs:
        lio_kw["mapRebuildEvery"] = 8
    if "gatheronce" in knobs:
        lio_kw["gatherOncePerScan"] = True
    if lio_kw:
        s.cfg.lio.params = dc.replace(s.cfg.lio.params, **lio_kw)

    world = syn.default_world(seed=0)
    traj = syn.figure8_trajectory(scale=3.0, period=30.0)
    d = 7.0

    imu_ts = (np.arange(int(d * 200)) + 1) / 200
    w_all, f_all = traj.imu(imu_ts)
    for i, t in enumerate(imu_ts):
        _, R = traj.pose(np.array([t]))
        rpy = Rsc.from_matrix(R[0]).as_euler("ZYX")[::-1]
        s.feed_imu(t, w_all[i], f_all[i], rpy=np.array(rpy, np.float32))
    for i in range(int(d * 10) - 1):
        ts = 0.05 + i / 10
        s.feed_lidar(ts, syn.simulate_lidar_scan(
            world, traj, ts, n_scan=4, horizon=900, sweep_time=0.1))
    for i in range(int(d * 10) - 1):
        ts = 0.1 + i / 10
        s.feed_image(ts, syn.render_camera_image(
            world, traj, ts, width=320, height=240, f=200.0))

    t0 = time.perf_counter()
    s.run()
    wall = time.perf_counter() - t0

    est_pos = np.stack([x6[3:6] for _, x6 in s.trajectory])
    gt = np.stack([traj.pose(np.array([t]))[0][0] for t, _ in s.trajectory])
    return {
        "knobs": sorted(knobs),
        "ate_m": round(float(ate_rmse(est_pos, gt, align=True)), 4),
        "n_poses": len(s.trajectory),
        "vio_init": bool(s._vio_initialized),
        "wall_s": round(wall, 1),
    }


if __name__ == "__main__":
    print(json.dumps(run(set(sys.argv[1:]))), flush=True)
