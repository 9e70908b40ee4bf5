"""Quantify the fused system's chaotic sensitivity and test basin
tightening (NOTES r5 open item #2): replay the bench's 12-s fused
sequence under physically-negligible input perturbations (one gyro
sample +1e-6 rad/s) and report the ATE spread, at the stock GN budget
(icp_iters=10) and a doubled one (icp_iters=20).

If the spread shrinks materially with tighter solves, basin tightening
is the validated de-chaos recipe that would make pallas_gn /
incremental-map parity (and every backend comparison) robust.

Usage: nohup python scripts/chaos_experiment.py > /tmp/chaos.log &
"""

from __future__ import annotations

import dataclasses as dc
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import bench  # noqa: E402


def run_one(tag, icp_iters, perturb_idx):
    from lvislam_tpu.utils.metrics import ate_rmse
    from lvislam_tpu.utils import synthetic as syn

    data = bench._lvi_seq_data()
    traj = syn.figure8_trajectory(scale=3.0, period=30.0)
    w = np.array(data["w"])
    if perturb_idx is not None:
        w = w.copy()
        w[perturb_idx, 0] += 1e-6  # one gyro sample, +1e-6 rad/s

    s = bench._lvi_build_system(pallas=True)
    if icp_iters is not None:
        s.cfg.lio.caps = dc.replace(s.cfg.lio.caps, icp_iters=icp_iters)
    t0 = time.time()
    for i, t in enumerate(data["imu_ts"]):
        s.feed_imu(t, w[i], data["f"][i], rpy=data["rpys"][i])
    for t, sc in data["scans"]:
        s.feed_lidar(t, sc)
    for t, im in data["imgs"]:
        s.feed_image(t, im)
    s.run()
    est = np.stack([x6[3:6] for _, x6 in s.trajectory])
    gt = np.stack([traj.pose(np.array([t]))[0][0] for t, _ in s.trajectory])
    ate = float(ate_rmse(est, gt, align=True))
    print(json.dumps({"tag": tag, "icp_iters": icp_iters,
                      "perturb": perturb_idx, "ate": round(ate, 5),
                      "wall_s": round(time.time() - t0, 1)}), flush=True)
    return ate, est


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    print("backend:", jax.default_backend(), flush=True)

    for iters in (None, 20):
        ates = []
        for p in (None, 400, 1200):
            ate, _ = run_one(f"iters{iters}_p{p}", iters, p)
            ates.append(ate)
        spread = (max(ates) - min(ates)) / max(min(ates), 1e-9) * 100
        print(json.dumps({"icp_iters": iters, "ates": ates,
                          "spread_pct": round(spread, 2)}), flush=True)


if __name__ == "__main__":
    main()
