"""LIO-only dose-response for the mapRebuildEvery ATE regression: replays
the LVI bench's scan stream (4x900, 10 Hz, figure-8) through LioPipeline
alone at the test-scale caps/gates and prints ATE per knob value.

Usage: JAX_PLATFORMS=cpu python scripts/bisect_lio.py [mapRebuildEvery ...]
"""

from __future__ import annotations

import dataclasses as dc
import json
import sys
import time

import numpy as np
from scipy.spatial.transform import Rotation as Rsc

sys.path.insert(0, ".")


def main():
    from lvislam_tpu.models.lio import mapping
    from lvislam_tpu.models.lio.pipeline import LioConfig, LioPipeline
    from lvislam_tpu.utils import synthetic as syn
    from lvislam_tpu.utils.metrics import ate_rmse

    world = syn.default_world(seed=0)
    traj = syn.figure8_trajectory(scale=3.0, period=30.0)
    d, rate = 7.0, 10.0
    scans = []
    for i in range(int(d * rate) - 1):
        ts = 0.05 + i / rate
        scan = syn.simulate_lidar_scan(world, traj, ts, n_scan=4,
                                       horizon=900, sweep_time=1.0 / rate)
        it = np.arange(ts - 0.005, ts + 1.0 / rate + 0.01, 1.0 / 200.0)
        w, f = traj.imu(it)
        _, R = traj.pose(np.array([ts]))
        rpy = Rsc.from_matrix(R[0]).as_euler("ZYX")[::-1]
        scans.append((dict(scan, stamp=ts), (it - ts).astype(np.float32),
                      w.astype(np.float32), np.array(rpy, np.float32)))
    gt = np.stack([s[0]["true_pos"] for s in scans])

    for arg in sys.argv[1:]:
        every = int(arg)
        cfg = LioConfig(
            n_scan=4, horizon=900, point_capacity=4096,
            caps=mapping.LioCaps(
                max_keyframes=64, kf_corner=256, kf_surf=1024,
                sel_keyframes=16, map_corner=4096, map_surf=16384,
                scan_corner=512, scan_surf=2048, max_loops=8, max_gps=8,
                loop_submap=4096, icp_iters=10,
            ),
            params=mapping.LioParams(
                keyframeAddingDistThreshold=0.3,
                keyframeAddingAngleThreshold=0.1,
                livox_keyframe_interval=0.5,
                degeneracyEigenThreshold=25.0,
                mapRebuildEvery=every,
            ),
            loop_every_n_scans=10 ** 9,
        )
        pipe = LioPipeline(cfg)
        t0 = time.perf_counter()
        for s in scans:
            pipe.process_scan(s[0], s[1], s[2], s[3])
        pipe.flush()
        est = pipe.trajectory_array()[:, 3:6]
        ate = float(ate_rmse(est, gt, align=True))
        print(json.dumps({
            "mapRebuildEvery": every, "ate_m": round(ate, 4),
            "wall_s": round(time.perf_counter() - t0, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
