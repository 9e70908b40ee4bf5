#!/usr/bin/env python
"""Run the full LVI system on the synthetic world and report ATE + rates.

Usage: python scripts/run_synthetic_lvi.py [duration_s] [--save-map DIR]
"""
import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np
from scipy.spatial.transform import Rotation as Rsc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("duration", nargs="?", type=float, default=6.0)
    ap.add_argument("--save-map", default=None)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--html", default=None,
                    help="standalone interactive 3D viewer (map + est "
                         "trajectory + GT overlay)")
    args = ap.parse_args()

    sys.path.insert(0, "tests")
    from test_lvi_system import make_system
    from lvislam_tpu.utils import synthetic as syn
    from lvislam_tpu.utils.metrics import ate_rmse

    sys_ = make_system()
    world = syn.default_world(seed=0)
    traj = syn.figure8_trajectory(scale=3.0, period=30.0)
    d = args.duration
    imu_ts = (np.arange(int(d * 200)) + 1) / 200
    w_all, f_all = traj.imu(imu_ts)
    for i, t in enumerate(imu_ts):
        _, R = traj.pose(np.array([t]))
        rpy = Rsc.from_matrix(R[0]).as_euler("ZYX")[::-1]
        sys_.feed_imu(t, w_all[i], f_all[i], rpy=np.array(rpy, np.float32))
    for i in range(int(d * 10) - 1):
        ts = 0.05 + i / 10
        sys_.feed_lidar(ts, syn.simulate_lidar_scan(
            world, traj, ts, n_scan=4, horizon=900, sweep_time=0.1))
    for i in range(int(d * 10) - 1):
        ts = 0.1 + i / 10
        sys_.feed_image(ts, syn.render_camera_image(
            world, traj, ts, width=320, height=240, f=200.0))

    t0 = time.time()
    sys_.run()
    wall = time.time() - t0

    est = np.stack([x6[3:6] for _, x6 in sys_.trajectory])
    gt = np.stack([traj.pose(np.array([t]))[0][0] for t, _ in sys_.trajectory])
    print(f"duration={d}s wall={wall:.1f}s rtf={d/wall:.2f}x "
          f"ATE={ate_rmse(est, gt):.3f}m scans={len(sys_.trajectory)} "
          f"imu_rate_odom={len(sys_.imu_rate_odom)} "
          f"vio_init={bool(np.asarray(sys_.vio.initialized))} "
          f"failures={int(sys_.vio.failure_count)}")

    if args.save_map:
        from lvislam_tpu.utils.checkpoint import save_map_service
        print(save_map_service(sys_.lio.state, args.save_map))
    if args.checkpoint:
        from lvislam_tpu.utils.checkpoint import save_state
        save_state(args.checkpoint, sys_.lio.state)
        print("checkpoint ->", args.checkpoint)
    if args.html:
        from lvislam_tpu.utils.checkpoint import global_map_points
        from lvislam_tpu.utils.debugviz import export_html_viewer
        corner, surf = global_map_points(sys_.lio.state)
        gmap = np.concatenate([corner, surf]) if len(corner) else surf
        print("viewer ->", export_html_viewer(
            args.html, est, map_xyz=gmap, gt=gt))


if __name__ == "__main__":
    main()
