"""Debug-image observability — the counterpart of the reference's visual
debug topics: the tracker's annotated feature image
(`feature_tracker_node.cpp` pub_match / `visualization.cpp`), the pose
graph's loop `match_image` (`pose_graph/src/keyframe.cpp:setMatchImage`),
and the depth-registration overlay (`depth_image` in
`feature_tracker_node.cpp`).

Re-designed for this stack: instead of ROS image topics, pure-numpy
rasterization written as binary PPM/PGM (no image-library dependency);
`LviSystem(debug_dir=...)` drops one artifact per stage at a configurable
stride. Viewable with any image tool; trivially convertible.
"""

from __future__ import annotations

import os

import numpy as np


def save_ppm(path: str, img: np.ndarray) -> None:
    """Write (H, W) grayscale as PGM or (H, W, 3) RGB as PPM (binary)."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        img = np.clip(img * 255.0 if img.max() <= 1.5 else img, 0, 255)
        img = img.astype(np.uint8)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        if img.ndim == 2:
            f.write(b"P5\n%d %d\n255\n" % (img.shape[1], img.shape[0]))
        else:
            f.write(b"P6\n%d %d\n255\n" % (img.shape[1], img.shape[0]))
        f.write(img.tobytes())


def _to_rgb(img: np.ndarray) -> np.ndarray:
    img = np.asarray(img, np.float32)
    if img.max() > 1.5:
        img = img / 255.0
    rgb = np.repeat(np.clip(img, 0, 1)[..., None], 3, axis=-1)
    return rgb


def _draw_cross(rgb, x, y, color, r=2):
    H, W, _ = rgb.shape
    x, y = int(round(x)), int(round(y))
    if not (0 <= x < W and 0 <= y < H):
        return
    rgb[max(y - r, 0):min(y + r + 1, H), x] = color
    rgb[y, max(x - r, 0):min(x + r + 1, W)] = color


def _draw_line(rgb, x0, y0, x1, y1, color):
    H, W, _ = rgb.shape
    n = int(max(abs(x1 - x0), abs(y1 - y0), 1))
    xs = np.linspace(x0, x1, n + 1).round().astype(int)
    ys = np.linspace(y0, y1, n + 1).round().astype(int)
    ok = (xs >= 0) & (xs < W) & (ys >= 0) & (ys < H)
    rgb[ys[ok], xs[ok]] = color


def draw_tracks(img, uv, valid, track_cnt=None, uv_prev=None) -> np.ndarray:
    """The reference's feature image: tracked features as crosses colored
    by track maturity (red=new .. blue=long-tracked, as in
    `feature_tracker_node.cpp` pub_match coloring), with optional velocity
    tails."""
    rgb = _to_rgb(img)
    uv = np.asarray(uv)
    valid = np.asarray(valid)
    cnt = np.asarray(track_cnt) if track_cnt is not None else np.full(len(uv), 10)
    for i in np.nonzero(valid)[0]:
        m = min(float(cnt[i]) / 20.0, 1.0)
        color = np.array([1.0 - m, 0.0, m], np.float32)
        if uv_prev is not None:
            _draw_line(rgb, uv_prev[i, 0], uv_prev[i, 1],
                       uv[i, 0], uv[i, 1], np.array([0.0, 1.0, 0.0]))
        _draw_cross(rgb, uv[i, 0], uv[i, 1], color)
    return rgb


def draw_matches(img_old, img_new, uv_old, uv_new, ok) -> np.ndarray:
    """The pose graph's loop `match_image`: old|new side by side with
    match lines (`keyframe.cpp` drawMatches equivalent)."""
    a, b = _to_rgb(img_old), _to_rgb(img_new)
    H = max(a.shape[0], b.shape[0])
    Wa = a.shape[1]
    canvas = np.zeros((H, Wa + b.shape[1], 3), np.float32)
    canvas[: a.shape[0], :Wa] = a
    canvas[: b.shape[0], Wa:] = b
    uv_old = np.asarray(uv_old)
    uv_new = np.asarray(uv_new)
    for i in np.nonzero(np.asarray(ok))[0]:
        _draw_cross(canvas, uv_old[i, 0], uv_old[i, 1], np.array([1.0, 1.0, 0.0]))
        _draw_cross(canvas, uv_new[i, 0] + Wa, uv_new[i, 1], np.array([0.0, 1.0, 1.0]))
        _draw_line(canvas, uv_old[i, 0], uv_old[i, 1],
                   uv_new[i, 0] + Wa, uv_new[i, 1], np.array([0.0, 0.8, 0.0]))
    return canvas


def draw_depth_overlay(img, uv, depth, valid, d_max=20.0) -> np.ndarray:
    """The depth-registration overlay (`feature_tracker_node.cpp`
    depth_image): features colored by associated lidar depth (near=red,
    far=blue); depth<=0 drawn gray."""
    rgb = _to_rgb(img)
    uv = np.asarray(uv)
    depth = np.asarray(depth)
    for i in np.nonzero(np.asarray(valid))[0]:
        if depth[i] > 0:
            m = min(float(depth[i]) / d_max, 1.0)
            color = np.array([1.0 - m, 0.1, m], np.float32)
        else:
            color = np.array([0.5, 0.5, 0.5], np.float32)
        _draw_cross(rgb, uv[i, 0], uv[i, 1], color, r=3)
    return rgb


def draw_map_topdown(
    map_xyz: np.ndarray,
    map_valid: np.ndarray | None = None,
    trajectory: np.ndarray | None = None,
    size: int = 800,
    margin: float = 1.0,
) -> np.ndarray:
    """Top-down global-map render — the counterpart of the reference's
    RViz global-map cloud + path topics (`visualizeGlobalMapThread` /
    `publishGlobalMap`, `mapOptimization.cpp:421-510`, and the trajectory
    path of `publishFrames`). Points shaded by height (low=dark blue,
    high=yellow-green); trajectory drawn red over the cloud.

    map_xyz: (N, 3) world-frame points; trajectory: (T, 3) positions.
    Returns (size, size, 3) float RGB for `save_ppm`.
    """
    pts = np.asarray(map_xyz, np.float32).reshape(-1, 3)
    if map_valid is not None:
        pts = pts[np.asarray(map_valid).reshape(-1)]
    pts = pts[np.isfinite(pts).all(-1)]
    tr = None
    if trajectory is not None:
        tr = np.asarray(trajectory, np.float32).reshape(-1, 3)
    allp = pts if tr is None or not len(tr) else np.concatenate([pts, tr])
    canvas = np.zeros((size, size, 3), np.float32)
    if not len(allp):
        return canvas
    lo = allp[:, :2].min(0) - margin
    hi = allp[:, :2].max(0) + margin
    scale = (size - 1) / max(float((hi - lo).max()), 1e-6)

    def to_px(xy):
        p = ((xy - lo) * scale).round().astype(int)
        return np.clip(p[:, 0], 0, size - 1), np.clip(
            size - 1 - p[:, 1], 0, size - 1)

    if len(pts):
        z = pts[:, 2]
        z0, z1 = np.percentile(z, [5, 95])
        m = np.clip((z - z0) / max(z1 - z0, 1e-6), 0, 1)[:, None]
        col = (1 - m) * np.array([[0.15, 0.25, 0.55]]) + m * np.array(
            [[0.65, 0.85, 0.25]])
        xs, ys = to_px(pts[:, :2])
        canvas[ys, xs] = np.maximum(canvas[ys, xs], col.astype(np.float32))
    if tr is not None and len(tr) > 1:
        xs, ys = to_px(tr[:, :2])
        red = np.array([1.0, 0.15, 0.15], np.float32)
        for i in range(len(xs) - 1):
            _draw_line(canvas, xs[i], ys[i], xs[i + 1], ys[i + 1], red)
    return canvas
