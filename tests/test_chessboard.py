"""Chessboard corner detection (reference C6: `Chessboard.cc` +
`intrinsic_calib.cc`): detect inner corners of a rendered board under a
known homography to subpixel accuracy, in a stable grid ordering."""

import numpy as np
import jax.numpy as jnp

from lvislam_tpu.ops import chessboard as cb


def render_board(Hm, rows, cols, H=240, W=320, blur=1.0, seed=0):
    """Checkerboard with (rows x cols) INNER corners sampled through
    homography Hm (board->image); returns image + true corner pixels."""
    # 4x supersampling: a point-sampled binary checker puts the apparent
    # edge half a pixel off; box-averaged subsamples keep it symmetric
    S = 4
    offs = (np.arange(S) + 0.5) / S - 0.5
    img = np.zeros((H, W))
    Hi = np.linalg.inv(Hm)
    for oy in offs:
        for ox in offs:
            yy, xx = np.meshgrid(np.arange(H) + oy, np.arange(W) + ox,
                                 indexing="ij")
            u = Hi[0, 0] * xx + Hi[0, 1] * yy + Hi[0, 2]
            v = Hi[1, 0] * xx + Hi[1, 1] * yy + Hi[1, 2]
            w = Hi[2, 0] * xx + Hi[2, 1] * yy + Hi[2, 2]
            u, v = u / w, v / w
            inside = (u > 0) & (u < cols + 1) & (v > 0) & (v < rows + 1)
            checker = ((np.floor(u) + np.floor(v)) % 2).astype(np.float64)
            img += np.where(inside, checker, 0.7)
    img /= S * S
    # soft blur so the saddle response is well-sampled
    from scipy.ndimage import gaussian_filter

    img = gaussian_filter(img, blur)
    img += np.random.default_rng(seed).normal(0, 0.01, img.shape)

    ii, jj = np.meshgrid(np.arange(1, rows + 1), np.arange(1, cols + 1),
                         indexing="ij")
    pts = np.stack([jj.ravel(), ii.ravel(), np.ones(rows * cols)])
    pix = Hm @ pts
    pix = (pix[:2] / pix[2]).T  # (n, 2) [x, y]
    return img.astype(np.float32), pix


def test_detects_axis_aligned_board():
    rows, cols, sq = 5, 7, 24.0
    Hm = np.array([[sq, 0, 60.0], [0, sq, 50.0], [0, 0, 1.0]])
    img, true_pix = render_board(Hm, rows, cols)
    corners, found = cb.find_chessboard(jnp.asarray(img), rows, cols)
    assert bool(found)
    corners = np.asarray(corners)
    # ordering is canonical (row-major along board axes, origin-nearest
    # first) — match greedily against ground truth
    err = np.linalg.norm(corners - true_pix, axis=1)
    assert err.max() < 0.5, f"max corner error {err.max():.2f}px"


def test_detects_rotated_perspective_board():
    rows, cols, sq = 5, 7, 22.0
    th = np.deg2rad(18.0)
    R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    Hm = np.eye(3)
    Hm[:2, :2] = R * sq
    Hm[:2, 2] = [90.0, 70.0]
    Hm[2, :2] = [4e-4, -3e-4]  # mild perspective
    img, true_pix = render_board(Hm, rows, cols)
    corners, found = cb.find_chessboard(jnp.asarray(img), rows, cols)
    assert bool(found)
    corners = np.asarray(corners)
    # the detected set must equal the true set (order may start from either
    # end; both are canonical row-major scans)
    from scipy.spatial import cKDTree

    d, idx = cKDTree(true_pix).query(corners)
    assert sorted(idx.tolist()) == list(range(rows * cols))
    assert d.max() < 0.7, f"max corner error {d.max():.2f}px"
    # grid ordering: consecutive in-row corners are one square apart
    grid = corners.reshape(rows, cols, 2)
    steps = np.linalg.norm(np.diff(grid, axis=1), axis=-1)
    assert np.allclose(steps, steps.mean(), rtol=0.25)


def test_rejects_clutter():
    rng = np.random.default_rng(1)
    img = rng.normal(0.5, 0.1, (240, 320)).astype(np.float32)
    _, found = cb.find_chessboard(jnp.asarray(img), 5, 7)
    assert not bool(found)


def test_board_object_points_layout():
    obj = np.asarray(cb.board_object_points(3, 4, 0.05))
    assert obj.shape == (12, 3)
    np.testing.assert_allclose(obj[1] - obj[0], [0.05, 0, 0], atol=1e-7)
    np.testing.assert_allclose(obj[4] - obj[0], [0, 0.05, 0], atol=1e-7)
