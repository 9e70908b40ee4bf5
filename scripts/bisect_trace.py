"""Per-scan error trace for a knob set (diagnosing knob interactions in
the bench LVI replay — companion of bisect_lvi.py). Prints one line per
trajectory pose: stamp, |pos_err| after global alignment, and raw err.

Usage: JAX_PLATFORMS=cpu python scripts/bisect_trace.py [knob ...]
"""

from __future__ import annotations

import dataclasses as dc
import json
import sys

import numpy as np
from scipy.spatial.transform import Rotation as Rsc

sys.path.insert(0, "tests")
sys.path.insert(0, ".")


def main():
    knobs = set(sys.argv[1:])
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
    s.run()

    est = np.stack([x6[3:6] for _, x6 in s.trajectory])
    gt = np.stack([traj.pose(np.array([t]))[0][0] for t, _ in s.trajectory])
    # unaligned per-scan error (map frame anchored at the first keyframe):
    # shows WHEN error is injected, not averaged away by alignment
    err = est - (gt - gt[0])
    for j, (t, _) in enumerate(s.trajectory):
        print(f"{t:6.2f} |e|={np.linalg.norm(err[j]):7.4f} "
              f"e=({err[j][0]:+.4f},{err[j][1]:+.4f},{err[j][2]:+.4f})")
    print(json.dumps({
        "knobs": sorted(knobs),
        "ate_m": round(float(ate_rmse(est, gt, align=True)), 4),
    }), flush=True)


if __name__ == "__main__":
    main()
