#!/usr/bin/env python
"""Run mono VIO on a EuRoC ASL sequence (BASELINE configs 2/4).

Usage: python scripts/run_euroc_vio.py /path/to/MH_01_easy/mav0 [max_seconds]

Uses the EuRoC cam0 intrinsics (pinhole radtan) and cam0-imu extrinsics
from the public sensor calibration.
"""
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    root = sys.argv[1]
    max_s = float(sys.argv[2]) if len(sys.argv) > 2 else 30.0

    from lvislam_tpu.core.config import CameraIntrinsics
    from lvislam_tpu.models.vio.pipeline import VioRunner, VioRunnerConfig
    from lvislam_tpu.models.vio import feature_tracker as ft, feature_manager as fm
    from lvislam_tpu.models.vio import estimator as est
    from lvislam_tpu.ops import ba
    from lvislam_tpu.utils.bag import euroc_reader

    cam = CameraIntrinsics(
        model_type="PINHOLE", image_width=752, image_height=480,
        gamma1=458.654, gamma2=457.296, u0=367.215, v0=248.375,
        k1=-0.28340811, k2=0.07395907, p1=0.00019359, p2=1.76187114e-05,
    )
    # cam0 -> imu (EuRoC sensor.yaml T_BS)
    R_bc = np.array([
        [0.0148655429818, -0.999880929698, 0.00414029679422],
        [0.999557249008, 0.0149672133247, 0.025715529948],
        [-0.0257744366974, 0.00375618835797, 0.999660727178],
    ])
    t_bc = (-0.0216401454975, -0.064676986768, 0.00981073058949)
    from scipy.spatial.transform import Rotation as Rsc

    qic = np.roll(Rsc.from_matrix(R_bc).as_quat(), 1)

    cfg = VioRunnerConfig(
        camera=cam,
        tracker=ft.TrackerParams(max_cnt=150, min_dist=30, equalize=True),
        caps=fm.VioCaps(window=10, max_features=256, imu_buf=64,
                        frame_features=150),
        params=est.VioParams(g_norm=9.81),
        ba=ba.BAConfig(window=10, max_features=256, iterations=6),
        image_height=480, image_width=752,
        tic=t_bc, qic=tuple(qic.tolist()),
    )
    runner = VioRunner(cfg)

    t0 = None
    n_img = 0
    wall0 = time.time()
    for t, topic, kind, msg in euroc_reader(root):
        if t0 is None:
            t0 = t
        if t - t0 > max_s:
            break
        if kind == "imu":
            runner.feed_imu(t, msg["gyro"], msg["acc"])
        elif kind == "image":
            out = runner.feed_image(t, msg["image"])
            n_img += 1
            if out is not None and n_img % 50 == 0:
                init = bool(np.asarray(out["initialized"]))
                print(f"t={t - t0:7.2f}s imgs={n_img} init={init} "
                      f"pos={np.round(np.asarray(out['pos']), 2)}")
    wall = time.time() - wall0
    print(f"processed {n_img} images in {wall:.1f}s "
          f"({(t - t0) / wall:.2f}x realtime); trajectory points: "
          f"{len(runner.trajectory)}")
    if runner.trajectory:
        from lvislam_tpu.utils.checkpoint import save_trajectory_tum
        save_trajectory_tum(
            "euroc_vio_trajectory.txt",
            [x[0] for x in runner.trajectory],
            [x[1] for x in runner.trajectory],
            [x[2] for x in runner.trajectory],
        )
        print("trajectory -> euroc_vio_trajectory.txt (TUM format)")


if __name__ == "__main__":
    main()
