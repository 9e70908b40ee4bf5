#!/usr/bin/env python
"""Replay a rosbag2 (sqlite3) recording through the full LVI system — the
equivalent of the reference's `ros2 launch lvi_sam run.launch` + `ros2 bag
play` (SURVEY.md §3 entry point).

Usage:
  python scripts/run_rosbag_lvi.py BAG.db3 \\
      [--lidar-yaml params_lidar.yaml] [--camera-yaml params_camera.yaml] \\
      [--imu-topic /livox/imu] [--lidar-topic /livox/lidar] \\
      [--image-topic /camera/image] [--max-seconds 60] [--save-map DIR] \\
      [--out trajectory.tum]

Topic defaults follow the reference's handheld Livox MID360 configuration
(`config_pkg/config/params_lidar.yaml`). IMU orientation RPY is derived by
gravity alignment when the bag's IMU messages carry no orientation.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("bag")
    ap.add_argument("--lidar-yaml")
    ap.add_argument("--camera-yaml")
    ap.add_argument("--imu-topic", default="/livox/imu")
    ap.add_argument("--lidar-topic", default="/livox/lidar")
    ap.add_argument("--image-topic", default="/camera/image")
    ap.add_argument("--gps-topic", default=None,
                    help="nav_msgs/Odometry in map frame (the reference's "
                         "odometry/gps) or sensor_msgs/NavSatFix (converted "
                         "to ENU around the first fix)")
    ap.add_argument("--gps-elevation", action="store_true",
                    help="trust GPS altitude (useGpsElevation)")
    ap.add_argument("--max-seconds", type=float, default=1e18)
    ap.add_argument("--save-map")
    ap.add_argument("--out", default="lvi_trajectory.tum")
    ap.add_argument("--no-camera", action="store_true",
                    help="LIO-only replay (BASELINE config 3)")
    args = ap.parse_args()

    from lvislam_tpu.core.config import load_yaml
    from lvislam_tpu.models.pipeline import LviConfig, LviSystem
    from lvislam_tpu.models.lio.pipeline import LioConfig
    from lvislam_tpu.utils.bag import Rosbag2Reader, pointcloud2_to_scan

    syscfg = load_yaml(args.lidar_yaml, args.camera_yaml)
    lid = syscfg.lidar
    vin = syscfg.vins
    from scipy.spatial.transform import Rotation as Rsc

    from lvislam_tpu.models.lio import imu_fusion as fus
    from lvislam_tpu.models.lio.mapping import LioParams
    from lvislam_tpu.models.vio import estimator as vest
    from lvislam_tpu.models.vio import feature_manager as vfm
    from lvislam_tpu.models.vio import feature_tracker as vft
    from lvislam_tpu.ops import ba as vba

    # camera-IMU extrinsic (imu^R_cam row-major, imu^T_cam -> tic/qic wxyz,
    # `parameters.cpp:96-120`)
    Ric = np.asarray(vin.extrinsicRotation, np.float64).reshape(3, 3)
    qx = Rsc.from_matrix(Ric).as_quat()  # xyzw
    qic = (float(qx[3]), float(qx[0]), float(qx[1]), float(qx[2]))
    cfg = LviConfig(
        lio=LioConfig(n_scan=lid.N_SCAN, horizon=lid.Horizon_SCAN,
                      point_capacity=1 << int(np.ceil(np.log2(
                          max(lid.N_SCAN * lid.Horizon_SCAN, 1024)))),
                      # IMU->lidar extrinsic (imuConverter, utility.h:315-349)
                      ext_rot=tuple(lid.extrinsicRot),
                      ext_rpy=tuple(lid.extrinsicRPY),
                      min_range=lid.lidarMinRange,
                      max_range=lid.lidarMaxRange,
                      edge_threshold=lid.edgeThreshold,
                      surf_threshold=lid.surfThreshold,
                      odometry_surf_leaf=lid.odometrySurfLeafSize,
                      loop_closure_enabled=lid.loopClosureEnableFlag,
                      params=LioParams(
                          mappingCornerLeafSize=lid.mappingCornerLeafSize,
                          mappingSurfLeafSize=lid.mappingSurfLeafSize,
                          surroundingKeyframeSearchRadius=(
                              lid.surroundingKeyframeSearchRadius),
                          keyframeAddingDistThreshold=(
                              lid.surroundingkeyframeAddingDistThreshold),
                          keyframeAddingAngleThreshold=(
                              lid.surroundingkeyframeAddingAngleThreshold),
                          imuRPYWeight=lid.imuRPYWeight,
                          z_tollerance=lid.z_tollerance,
                          rotation_tollerance=lid.rotation_tollerance,
                          useImuHeadingInitialization=(
                              lid.useImuHeadingInitialization),
                          historyKeyframeSearchRadius=(
                              lid.historyKeyframeSearchRadius),
                          historyKeyframeSearchTimeDiff=(
                              lid.historyKeyframeSearchTimeDiff),
                          historyKeyframeSearchNum=lid.historyKeyframeSearchNum,
                          historyKeyframeFitnessScore=(
                              lid.historyKeyframeFitnessScore),
                          edgeFeatureMinValidNum=lid.edgeFeatureMinValidNum,
                          surfFeatureMinValidNum=lid.surfFeatureMinValidNum,
                          gpsCovThreshold=lid.gpsCovThreshold,
                          poseCovThreshold=lid.poseCovThreshold,
                      )),
        fusion=fus.FusionParams(imuAccNoise=lid.imuAccNoise,
                                imuGyrNoise=lid.imuGyrNoise,
                                imuAccBiasN=lid.imuAccBiasN,
                                imuGyrBiasN=lid.imuGyrBiasN,
                                imuGravity=lid.imuGravity,
                                extTrans=tuple(lid.extrinsicTrans)),
        # VIS parameters (`parameters.cpp:52-150`)
        vio_caps=vfm.VioCaps(window=vin.WINDOW_SIZE,
                             max_features=max(vin.max_cnt, 128),
                             imu_buf=64, frame_features=vin.max_cnt),
        vio_params=vest.VioParams(
            acc_n=vin.acc_n, gyr_n=vin.gyr_n, acc_w=vin.acc_w,
            gyr_w=vin.gyr_w, g_norm=vin.g_norm,
            min_parallax=vin.keyframe_parallax / vin.FOCAL_LENGTH,
            init_depth=vin.INIT_DEPTH,
            estimate_extrinsic_rotation=vin.estimate_extrinsic == 2),
        ba=vba.BAConfig(window=vin.WINDOW_SIZE,
                        max_features=max(vin.max_cnt, 128),
                        focal=vin.FOCAL_LENGTH,
                        iterations=vin.max_num_iterations,
                        estimate_td=vin.estimate_td,
                        estimate_extrinsic=vin.estimate_extrinsic == 1,
                        solver="schur"),
        tracker=vft.TrackerParams(max_cnt=vin.max_cnt, min_dist=vin.min_dist,
                                  F_threshold=vin.F_threshold,
                                  equalize=vin.equalize,
                                  focal_virtual=vin.FOCAL_LENGTH),
        tic=tuple(float(v) for v in vin.extrinsicTranslation),
        qic=qic,
        camera=vin.camera,
        image_height=vin.camera.image_height,
        image_width=vin.camera.image_width,
        use_lidar_depth=vin.use_lidar,
        lidar_skip=vin.lidar_skip,
        rolling_shutter_tr=(vin.rolling_shutter_tr
                            if vin.rolling_shutter else 0.0),
        use_loop_detector=not args.no_camera and vin.loop_closure,
        mapping_process_interval=lid.mappingProcessInterval,
        # vocab_path defaults to "auto": the committed trained vocabulary
        # (configs/brief_vocab.npz) loads wherever the process starts from
        # (pose_graph_node.cpp:297-314)
    )
    sys_ = LviSystem(cfg)

    topics = {args.imu_topic, args.lidar_topic}
    if not args.no_camera:
        topics.add(args.image_topic)
    if args.gps_topic:
        topics.add(args.gps_topic)
    ref_fix = None  # first NavSatFix, ENU origin
    t0 = None
    n_msgs = 0
    # gravity-aligned RPY from the accelerometer when the IMU carries no
    # orientation (the reference requires orientation; MID360 bags lack it)
    for t, topic, kind, msg in Rosbag2Reader(args.bag, topics=list(topics)):
        if t0 is None:
            t0 = t
        if t - t0 > args.max_seconds:
            break
        n_msgs += 1
        if kind == "imu":
            rpy = msg.get("rpy")
            if rpy is None:
                a = msg["acc"]
                g = a / max(np.linalg.norm(a), 1e-6)
                rpy = np.array([np.arctan2(g[1], g[2]),
                                -np.arcsin(np.clip(g[0], -1, 1)), 0.0],
                               np.float32)
            sys_.feed_imu(t - t0, msg["gyro"], msg["acc"], rpy=rpy)
        elif kind == "livox":
            sys_.feed_lidar(t - t0, msg)
        elif kind == "pointcloud":
            sys_.feed_lidar(t - t0, pointcloud2_to_scan(msg))
        elif kind == "image":
            sys_.feed_image(t - t0, msg["image"])
        elif kind == "odometry" and topic == args.gps_topic:
            sys_.feed_gps(t - t0, msg["pos"], msg["pos_cov"],
                          use_elevation=args.gps_elevation)
        elif kind == "navsatfix":
            if msg["status"] < 0:  # STATUS_NO_FIX
                continue
            if ref_fix is None:
                ref_fix = (msg["lat"], msg["lon"], msg["alt"])
            from lvislam_tpu.utils.bag import navsat_to_enu
            enu = navsat_to_enu(msg["lat"], msg["lon"], msg["alt"], *ref_fix)
            sys_.feed_gps(t - t0, enu, msg["pos_cov"],
                          use_elevation=args.gps_elevation)

    print(f"replaying {n_msgs} messages ...")
    w0 = time.time()
    sys_.run()
    wall = time.time() - w0
    dur = (sys_.trajectory[-1][0] - sys_.trajectory[0][0]) if sys_.trajectory else 0
    print(f"bag span {dur:.1f}s processed in {wall:.1f}s "
          f"({dur / max(wall, 1e-9):.2f}x realtime), "
          f"{len(sys_.trajectory)} poses")
    if args.gps_topic:
        print(f"gps factors applied: {int(sys_.lio.state.n_gps)}")

    if sys_.trajectory:
        from scipy.spatial.transform import Rotation as Rsc
        from lvislam_tpu.utils.checkpoint import save_trajectory_tum
        from lvislam_tpu.core import lie
        import jax.numpy as jnp

        ts, ps, qs = [], [], []
        for t, x6 in sys_.trajectory:
            x6 = np.asarray(x6)
            ts.append(t)
            ps.append(x6[3:6])
            T = np.asarray(lie.pose6_to_matrix(jnp.asarray(x6)))
            qs.append(np.roll(Rsc.from_matrix(T[:3, :3]).as_quat(), 1))
        save_trajectory_tum(args.out, ts, ps, qs)
        print(f"trajectory -> {args.out} (TUM format)")
    if args.save_map:
        from lvislam_tpu.utils.checkpoint import save_map_service

        print(save_map_service(sys_.lio.state, args.save_map))


if __name__ == "__main__":
    main()
