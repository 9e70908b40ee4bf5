"""End-to-end C6 parity: rendered board images -> saddle-point corner
detection (`ops/chessboard`) -> intrinsic calibration (`ops/calibration`),
recovering the true focal length — the reference's `Calibration` executable
flow (`intrinsic_calib.cc`: findChessboardCorners + Ceres solve)."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial import cKDTree
from scipy.spatial.transform import Rotation as Rsc

from lvislam_tpu.ops import chessboard as cb
from lvislam_tpu.ops import calibration as cal

import sys
sys.path.insert(0, "tests")
from test_chessboard import render_board  # noqa: E402

ROWS, COLS, SQ = 5, 7, 0.03  # metres per square
F, CX, CY = 250.0, 160.0, 120.0


def view_homography(rvec, tvec):
    """Board cell coords (inner corner (j+1, i+1)) -> pixels."""
    K = np.array([[F, 0, CX], [0, F, CY], [0, 0, 1.0]])
    R = Rsc.from_rotvec(rvec).as_matrix()
    Rt = np.column_stack([R[:, 0], R[:, 1], tvec])  # plane z=0
    S = np.array([[SQ, 0, -SQ], [0, SQ, -SQ], [0, 0, 1.0]])  # cells->metres
    Hm = K @ Rt @ S
    return Hm / Hm[2, 2]


def test_detect_then_calibrate_recovers_focal():
    rng = np.random.default_rng(4)
    views = []
    for v in range(8):
        # strong out-of-plane tilt: planar targets only constrain focal
        # when views are well tilted (Zhang degeneracy)
        rv = np.array([rng.uniform(0.2, 0.35) * rng.choice([-1, 1]),
                       rng.uniform(0.2, 0.35) * rng.choice([-1, 1]),
                       rng.uniform(-0.3, 0.3)])
        tv = np.array([rng.uniform(-0.135, -0.105),
                       rng.uniform(-0.105, -0.075),
                       rng.uniform(0.42, 0.65)])
        views.append((rv, tv))

    obj = np.asarray(cb.board_object_points(ROWS, COLS, SQ))[:, :2]
    img_pts, ok_all = [], True
    for rv, tv in views:
        Hm = view_homography(rv, tv)
        img, true_pix = render_board(Hm, ROWS, COLS, H=240, W=320, seed=7)
        corners, found = cb.find_chessboard(jnp.asarray(img), ROWS, COLS)
        assert bool(found)
        corners = np.asarray(corners)
        # canonicalize detected ordering against the true grid (correspond-
        # ence must be a bijection; what's under test is corner accuracy)
        d, idx = cKDTree(corners).query(true_pix)
        assert sorted(idx.tolist()) == list(range(ROWS * COLS))
        assert d.max() < 0.7, d.max()
        img_pts.append(corners[idx])

    img_pts = np.stack(img_pts).astype(np.float32)
    V, N = img_pts.shape[:2]
    intr0 = np.array([F * 1.12, F * 0.9, CX + 6, CY - 5, 0, 0, 0, 0],
                     np.float32)
    rv0 = np.stack([v[0] for v in views]).astype(np.float32) + 0.02
    tv0 = (np.stack([v[1] for v in views]) * 1.08).astype(np.float32)
    res = cal.calibrate(
        jnp.asarray(obj.astype(np.float32)), jnp.asarray(img_pts),
        jnp.ones((V, N), bool), jnp.asarray(intr0),
        jnp.asarray(rv0), jnp.asarray(tv0),
        model_type="PINHOLE", iterations=25,
    )
    est = np.asarray(res.intrinsics)
    assert float(res.rms_px) < 0.3, float(res.rms_px)
    np.testing.assert_allclose(est[0], F, rtol=0.01)
    np.testing.assert_allclose(est[1], F, rtol=0.01)
    # the principal point is the weakest parameter of small-board planar
    # calibration (correlated with the free distortion terms)
    np.testing.assert_allclose(est[2:4], [CX, CY], atol=10.0)
