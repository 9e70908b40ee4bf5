"""lvislam_tpu — TPU-native LiDAR-Visual-Inertial SLAM framework.

A brand-new, ROS-free re-design of the LVI-SAM-style stack in
valentinomario/LiDAR-Visual-Inertial-SLAM (VINS-Mono VIO + LIO-SAM LIO, tightly
coupled) for TPU hardware: every per-measurement hot loop is a fixed-shape,
jit-compiled JAX/Pallas kernel; estimators are batched Gauss-Newton /
Levenberg-Marquardt solvers on padded factor blocks; the multi-process ROS 2
dataflow graph of the reference becomes an in-process typed message bus driven
by a deterministic replay scheduler.

Package layout (maps SURVEY.md section 2's component inventory):

- ``core``     — SO(3)/SE(3)/quaternion math, typed config tree, message types.
- ``ops``      — device kernels: IMU preintegration, scan deskew, LOAM features,
                 voxel-hash kNN, scan-to-map GN, ICP, pyramidal LK, camera
                 models, RANSAC, BA + marginalization, BRIEF/BoW, SfM init.
- ``models``   — the subsystems: ``lio`` (image projection, feature extraction,
                 map optimization, IMU fusion), ``vio`` (feature tracker,
                 sliding-window estimator, initializer), ``loop`` (visual loop
                 detector, keyframe DB), and the fused pipeline.
- ``parallel`` — jax.sharding meshes, shard_map'd kNN / factor blocks,
                 batched multi-sequence replay.
- ``utils``    — replay scheduler + bus, synthetic worlds and bag IO, metrics
                 (ATE/RPE), checkpointing, profiling.
"""

import jax as _jax

# Estimation math is precision-critical: the default TPU matmul precision
# (bfloat16 MXU passes) corrupts small 3x3/15x15 geometry products by ~1e-3,
# which is fatal for Gauss-Newton convergence. Default to full f32 matmuls;
# throughput-bound kernels (LK correlation, Hamming popcount, BoW scoring)
# opt back into bf16 explicitly where it is numerically safe.
_jax.config.update("jax_default_matmul_precision", "highest")

__version__ = "0.1.0"
