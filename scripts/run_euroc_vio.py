#!/usr/bin/env python
"""Run mono VIO on a EuRoC ASL sequence (BASELINE configs 2/4).

Usage: python scripts/run_euroc_vio.py /path/to/MH_01_easy/mav0
           [--max-seconds S] [--camera-yaml params_camera.yaml]
           [--out euroc_vio_trajectory.txt]

Without --camera-yaml the public EuRoC cam0 calibration (pinhole radtan)
and cam0-imu extrinsics are used; with it the camera model, noise and
extrinsics come from a reference-format params_camera.yaml — the same
parameterization the reference's vins_estimator reads
(`vins_estimator/src/parameters.cpp:52-150`).
"""
import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def build_config(camera_yaml: str | None):
    from scipy.spatial.transform import Rotation as Rsc

    from lvislam_tpu.core.config import CameraIntrinsics, load_yaml
    from lvislam_tpu.models.vio.pipeline import VioRunnerConfig
    from lvislam_tpu.models.vio import feature_tracker as ft, feature_manager as fm
    from lvislam_tpu.models.vio import estimator as est
    from lvislam_tpu.ops import ba

    if camera_yaml is None:
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
        tracker = ft.TrackerParams(max_cnt=150, min_dist=30, equalize=True)
        caps = fm.VioCaps(window=10, max_features=256, imu_buf=64,
                          frame_features=150)
        params = est.VioParams(g_norm=9.81)
        bacfg = ba.BAConfig(window=10, max_features=256, iterations=6)
        h, w = 480, 752
    else:
        syscfg = load_yaml(None, camera_yaml)
        vin = syscfg.vins
        cam = vin.camera
        R_bc = np.asarray(vin.extrinsicRotation, np.float64).reshape(3, 3)
        t_bc = tuple(float(x) for x in vin.extrinsicTranslation)
        tracker = ft.TrackerParams(
            max_cnt=vin.max_cnt, min_dist=vin.min_dist,
            equalize=bool(vin.equalize))
        caps = fm.VioCaps(window=vin.WINDOW_SIZE,
                          max_features=max(vin.max_cnt, 128), imu_buf=64,
                          frame_features=vin.max_cnt)
        params = est.VioParams(g_norm=vin.g_norm, acc_n=vin.acc_n,
                               gyr_n=vin.gyr_n, acc_w=vin.acc_w,
                               gyr_w=vin.gyr_w)
        bacfg = ba.BAConfig(window=vin.WINDOW_SIZE,
                            max_features=max(vin.max_cnt, 128),
                            iterations=int(vin.max_num_iterations),
                            estimate_td=bool(vin.estimate_td))
        h, w = cam.image_height, cam.image_width

    qx = Rsc.from_matrix(R_bc).as_quat()  # xyzw
    qic = (float(qx[3]), float(qx[0]), float(qx[1]), float(qx[2]))
    freq = 20.0 if camera_yaml is None else float(vin.freq)
    return VioRunnerConfig(
        camera=cam, tracker=tracker, caps=caps, params=params, ba=bacfg,
        image_height=h, image_width=w, freq=freq, tic=t_bc, qic=qic,
    )


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("root", help="EuRoC mav0 directory")
    ap.add_argument("--max-seconds", type=float, default=30.0)
    ap.add_argument("--camera-yaml", default=None,
                    help="reference-format params_camera.yaml overriding "
                         "the public EuRoC calibration")
    ap.add_argument("--out", default="euroc_vio_trajectory.txt")
    # positional max_seconds kept for backward compatibility
    ap.add_argument("legacy_max", nargs="?", type=float, default=None)
    args = ap.parse_args(argv)
    max_s = args.legacy_max if args.legacy_max is not None else args.max_seconds

    from lvislam_tpu.models.vio.pipeline import VioRunner
    from lvislam_tpu.utils.bag import euroc_reader

    runner = VioRunner(build_config(args.camera_yaml))

    t0 = None
    n_img = 0
    wall0 = time.time()
    # EuRoC stamps are ~1.4e9 s absolute; device stamps are float32, so
    # rebase to sequence-relative time (the rosbag runner does the same) —
    # the TUM export below is in rebased seconds
    for t, topic, kind, msg in euroc_reader(args.root):
        if t0 is None:
            t0 = t
        if t - t0 > max_s:
            break
        if kind == "imu":
            runner.feed_imu(t - t0, msg["gyro"], msg["acc"])
        elif kind == "image":
            out = runner.feed_image(t - t0, msg["image"])
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
            args.out,
            [x[0] for x in runner.trajectory],
            [x[1] for x in runner.trajectory],
            [x[2] for x in runner.trajectory],
        )
        print(f"trajectory -> {args.out} (TUM format)")
    return runner


if __name__ == "__main__":
    main()
