"""Quick LIO debug driver: few scans, per-scan diagnostics."""
import sys, time
sys.path.insert(0, ".")
import os
import numpy as np
import jax

jax.config.update("jax_default_device", jax.devices("cpu")[0])

from scipy.spatial.transform import Rotation as Rsc
from lvislam_tpu.utils import synthetic as syn
from lvislam_tpu.models.lio import mapping
from lvislam_tpu.models.lio.pipeline import LioConfig, LioPipeline

SMALL_CAPS = mapping.LioCaps(
    max_keyframes=64, kf_corner=256, kf_surf=1024, sel_keyframes=16,
    map_corner=4096, map_surf=16384, scan_corner=512, scan_surf=2048,
    max_loops=8, max_gps=8, loop_submap=4096, icp_iters=10,
)

world = syn.default_world(seed=0)
traj = syn.figure8_trajectory(scale=3.0, period=30.0)
cfg = LioConfig(
    n_scan=4, horizon=900, point_capacity=4096, caps=SMALL_CAPS,
    params=mapping.LioParams(
        keyframeAddingDistThreshold=0.3, keyframeAddingAngleThreshold=0.1,
        livox_keyframe_interval=0.5, degeneracyEigenThreshold=25.0,
    ),
    loop_every_n_scans=1000,
)
pipe = LioPipeline(cfg)
rate, imu_rate = 10.0, 200.0
n = int(float(sys.argv[1]) if len(sys.argv) > 1 else 8)
for i in range(n):
    ts = i / rate
    scan = syn.simulate_lidar_scan(world, traj, ts, n_scan=4, horizon=900, sweep_time=0.1)
    it = np.arange(ts - 0.005, ts + 1.0 / rate + 0.01, 1.0 / imu_rate)
    w, f = traj.imu(it)
    _, R = traj.pose(np.array([ts]))
    rpy = Rsc.from_matrix(R[0]).as_euler("ZYX")[::-1]
    t0 = time.time()
    out = pipe.process_scan(scan, (it - ts).astype(np.float32), w.astype(np.float32),
                            np.array(rpy, np.float32))
    x6 = np.asarray(out.x6)
    gt_p = scan["true_pos"]
    print(f"scan {i}: t={time.time()-t0:.2f}s x6_t={x6[3:]} gt={gt_p} "
          f"nres={int(out.num_residuals)} it={int(out.gn_iters)} kf={int(pipe.state.kf_count)} "
          f"degen={bool(out.degenerate)} keyframe={bool(out.is_keyframe)}")
