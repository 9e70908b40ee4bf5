"""End-to-end EuRoC ASL replay (BASELINE configs 2/4 workflow): a real
mav0 folder layout — imu0/data.csv with nanosecond stamps + cam0 PNG
frames — generated from the synthetic renderer, driven through
`scripts/run_euroc_vio.py` exactly as a user would run MH_01. Exercises
the ASL parsing (`utils/bag.euroc_reader`), the YAML camera
parameterization (`vins_estimator/src/parameters.cpp:52-150`
equivalent), the VioRunner FREQ/restart protocol, and the TUM trajectory
export — none of which the unit tests drive as one path."""

import os
import sys

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as Rsc

from lvislam_tpu.utils import synthetic as syn
from lvislam_tpu.utils.metrics import ate_rmse

_T0_NS = 1_403_636_580_000_000_000  # MH_01-era epoch: exercises f64 stamps


def _write_euroc_fixture(root, world, traj, duration, cam_rate=10.0,
                         imu_rate=200.0):
    from PIL import Image

    os.makedirs(os.path.join(root, "imu0"))
    os.makedirs(os.path.join(root, "cam0", "data"))
    ts = (np.arange(int(duration * imu_rate)) + 1) / imu_rate
    w_all, f_all = traj.imu(ts)
    with open(os.path.join(root, "imu0", "data.csv"), "w") as f:
        f.write("#timestamp [ns],w_RS_S_x,w_RS_S_y,w_RS_S_z,"
                "a_RS_S_x,a_RS_S_y,a_RS_S_z\n")
        for i, t in enumerate(ts):
            ns = _T0_NS + int(round(t * 1e9))
            f.write(f"{ns},{w_all[i, 0]},{w_all[i, 1]},{w_all[i, 2]},"
                    f"{f_all[i, 0]},{f_all[i, 1]},{f_all[i, 2]}\n")
    img_ts = []
    with open(os.path.join(root, "cam0", "data.csv"), "w") as f:
        f.write("#timestamp [ns],filename\n")
        for i in range(int(duration * cam_rate) - 1):
            t = 0.1 + i / cam_rate
            img = syn.render_camera_image(world, traj, t, width=320,
                                          height=240, f=200.0)
            ns = _T0_NS + int(round(t * 1e9))
            name = f"{ns}.png"
            Image.fromarray((np.asarray(img) * 255).astype(np.uint8)).save(
                os.path.join(root, "cam0", "data", name))
            f.write(f"{ns},{name}\n")
            img_ts.append(t)
    return img_ts


@pytest.mark.slow
def test_euroc_script_end_to_end(tmp_path):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    import run_euroc_vio

    world = syn.default_world(seed=0)
    # scale 1.5 / period 8 (not the scale-3/period-30 used elsewhere):
    # visual-inertial alignment needs REAL accelerometer excitation to
    # observe scale — at period 30 the centripetal acceleration is
    # ~0.13 m/s^2, delta_v is pure gravity, and the scale column of
    # `linear_alignment` is numerically null (smallest singular value
    # ~8e-4 measured on the old fixture; VINS-Mono itself requires
    # "enough IMU excitation" for exactly this reason — the round-3
    # version of this fixture could NEVER initialize). scale-1.5/period-8
    # gives ~0.9 m/s^2 of excitation at a tracking-friendly ~1.4 m/s.
    traj = syn.figure8_trajectory(scale=1.5, period=8.0)
    root = str(tmp_path / "mav0")
    _write_euroc_fixture(root, world, traj, duration=5.0)

    cam_yaml = os.path.join(os.path.dirname(__file__), "data",
                            "fixture_camera.yaml")
    out = str(tmp_path / "traj.tum")
    runner = run_euroc_vio.main(
        [root, "--camera-yaml", cam_yaml, "--max-seconds", "5.0",
         "--out", out])

    # the estimator consumed the stream and initialized from visual SfM +
    # IMU alignment (no lidar seed on configs 2/4)
    assert runner.vio is not None
    assert int(runner.vio.frame_count) >= 10
    assert bool(np.asarray(runner.vio.initialized)), "VIO never initialized"

    # TUM export exists, is finite, and tracks the ground truth after
    # similarity alignment (monocular VIO: scale from IMU, frame gauge free)
    assert os.path.exists(out)
    rows = np.loadtxt(out)
    assert rows.ndim == 2 and rows.shape[0] >= 10 and rows.shape[1] == 8
    assert np.isfinite(rows).all()
    est_t = rows[:, 0]  # the script exports sequence-rebased stamps
    est_pos = rows[:, 1:4]
    gt = np.stack([traj.pose(np.array([t]))[0][0] for t in est_t])
    rmse = float(ate_rmse(est_pos, gt, align=True))
    assert rmse < 0.5, f"EuRoC-replay ATE {rmse}"
