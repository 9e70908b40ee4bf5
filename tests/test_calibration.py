"""Intrinsic calibration: recover pinhole and MEI parameters from synthetic
board views (the camera_model Calibration tool's optimizer)."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as Rsc

from lvislam_tpu.ops import calibration as cal


def synth_views(intr_true, model, n_views=8, seed=0):
    rng = np.random.default_rng(seed)
    gx, gy = np.meshgrid(np.arange(7) * 0.05, np.arange(5) * 0.05)
    board = np.stack([gx.ravel(), gy.ravel()], -1).astype(np.float32)
    obj = np.concatenate([board, np.zeros((len(board), 1), np.float32)], -1)
    rvecs, tvecs, img_pts = [], [], []
    for _ in range(n_views):
        rv = rng.uniform(-0.3, 0.3, 3)
        rv[2] = rng.uniform(-0.5, 0.5)
        tv = np.array([rng.uniform(-0.1, 0.0), rng.uniform(-0.1, 0.0),
                       rng.uniform(0.4, 0.8)])
        R = Rsc.from_rotvec(rv).as_matrix()
        pc = obj @ R.T + tv
        uv = np.asarray(cal._project(jnp.asarray(intr_true), jnp.asarray(pc, jnp.float32), model))
        uv = uv + rng.normal(0, 0.1, uv.shape)  # 0.1 px noise
        rvecs.append(rv)
        tvecs.append(tv)
        img_pts.append(uv)
    return board, np.stack(img_pts), np.stack(rvecs), np.stack(tvecs)


def run_case(model, intr_true, perturb):
    board, img_pts, rv, tv = synth_views(np.asarray(intr_true, np.float32), model)
    V, N, _ = img_pts.shape
    intr0 = np.asarray(intr_true, np.float32) * (1 + perturb)
    res = cal.calibrate(
        jnp.asarray(board), jnp.asarray(img_pts, jnp.float32),
        jnp.ones((V, N), bool), jnp.asarray(intr0),
        jnp.asarray(rv + 0.02, jnp.float32), jnp.asarray(tv * 1.05, jnp.float32),
        model_type=model, iterations=20,
    )
    return np.asarray(res.intrinsics), float(res.rms_px)


def test_pinhole_calibration():
    truth = [460.0, 455.0, 320.0, 240.0, -0.05, 0.02, 1e-3, -5e-4]
    perturb = np.array([0.03, -0.03, 0.01, -0.01, -1.0, -1.0, -1.0, -1.0])
    est, rms = run_case("PINHOLE", truth, perturb)
    assert rms < 0.2, rms
    np.testing.assert_allclose(est[:2], truth[:2], rtol=5e-3)  # focal
    np.testing.assert_allclose(est[2:4], truth[2:4], atol=3.0)  # principal pt
    np.testing.assert_allclose(est[4], truth[4], atol=1e-2)


def test_mei_calibration():
    truth = [1.0, 900.0, 890.0, 500.0, 300.0, -0.03, 0.01, 5e-4, -2e-4]
    perturb = np.array([0.1, 0.05, -0.05, 0.01, -0.01, -1.0, -1.0, -1.0, -1.0])
    est, rms = run_case("MEI", truth, perturb)
    assert rms < 0.2, rms
    # MEI xi/f are correlated; projection accuracy is the real criterion
    np.testing.assert_allclose(est[3:5], truth[3:5], rtol=2e-2)
