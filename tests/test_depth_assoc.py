"""Depth association oracle tests (`ops/depth_assoc.feature_depths`).

The TPU implementation scatters the cloud into a polar range image with
two exact scatter-mins (nearest point per bin, lowest-index tie-break)
and runs a windowed exact 3-NN; the oracle below reproduces the
reference's logic (`feature_tracker/src/feature_tracker.h:116-331`) with
plain numpy loops."""

import numpy as np
import jax.numpy as jnp

from lvislam_tpu.ops.depth_assoc import feature_depths


def _oracle(features_norm, features_valid, cloud, cloud_valid,
            num_bins=360, window=6):
    P = cloud.shape[0]
    bin_res = 180.0 / num_bins
    x, y, z = cloud[:, 0], cloud[:, 1], cloud[:, 2]
    ok = (cloud_valid & (x > 0)
          & (np.abs(y / np.maximum(x, 1e-9)) <= 10)
          & (np.abs(z / np.maximum(x, 1e-9)) <= 10))
    row = np.round((np.degrees(np.arctan2(z, np.hypot(x, y))) + 90.0)
                   / bin_res).astype(int)
    col = np.round(np.degrees(np.arctan2(x, y)) / bin_res).astype(int)
    ok &= (row >= 0) & (row < num_bins) & (col >= 0) & (col < num_bins)
    rng = np.linalg.norm(cloud, axis=-1)

    # nearest point per bin, lowest index on range ties
    win = {}
    for i in range(P):
        if not ok[i]:
            continue
        b = (row[i], col[i])
        if b not in win or rng[i] < rng[win[b]]:
            win[b] = i
    n_pts = len(win)

    f3 = np.stack([np.ones(len(features_norm)), features_norm[:, 0],
                   features_norm[:, 1]], -1)
    v = np.stack([f3[:, 0], -f3[:, 1], -f3[:, 2]], -1)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    f_row = np.round((np.degrees(np.arctan2(
        v[:, 2], np.hypot(v[:, 0], v[:, 1]))) + 90.0) / bin_res).astype(int)
    f_col = np.round(np.degrees(np.arctan2(v[:, 0], v[:, 1]))
                     / bin_res).astype(int)

    thr = (np.sin(np.radians(bin_res)) * 5.0) ** 2
    out = np.full(len(features_norm), -1.0, np.float32)
    for f in range(len(features_norm)):
        if not features_valid[f] or n_pts < 10:
            continue
        cands = []
        for dr in range(-window, window + 1):
            for dc in range(-window, window + 1):
                b = (min(max(f_row[f] + dr, 0), num_bins - 1),
                     min(max(f_col[f] + dc, 0), num_bins - 1))
                if b in win:
                    i = win[b]
                    u = cloud[i] / rng[i]
                    cands.append((np.sum((u - v[f]) ** 2), i))
        cands.sort()
        if len(cands) < 3 or cands[2][0] >= thr:
            continue
        A, B, C = (cloud[cands[k][1]] for k in range(3))
        r123 = np.array([rng[cands[k][1]] for k in range(3)])
        N = np.cross(A - B, B - C)
        denom = N @ v[f]
        if abs(denom) <= 1e-9:
            continue
        s = (N @ A) / denom
        if r123.max() - r123.min() > 2.0 or s <= 0.5:
            continue
        s = np.clip(s, r123.min(), r123.max())
        depth = v[f, 0] * s
        if depth > 3.0:
            out[f] = depth
    return out


def test_feature_depths_matches_oracle():
    rs = np.random.RandomState(5)
    P, F = 3000, 64
    # wall-ish cloud 8-14 m ahead: dense enough for 3-NN plane fits
    pts = np.stack([
        rs.uniform(8.0, 14.0, P),
        rs.uniform(-6.0, 6.0, P),
        rs.uniform(-3.0, 3.0, P),
    ], -1).astype(np.float32)
    val = rs.rand(P) > 0.05
    fn = (rs.rand(F, 2).astype(np.float32) - 0.5) * 0.6
    fv = rs.rand(F) > 0.1

    got = np.asarray(feature_depths(
        jnp.asarray(fn), jnp.asarray(fv), jnp.asarray(pts), jnp.asarray(val)))
    want = _oracle(fn, fv, pts, val)
    # identical association decisions and plane-interpolated depths
    np.testing.assert_array_equal(got > 0, want > 0)
    m = want > 0
    assert m.sum() >= 10, "fixture produced too few associations"
    np.testing.assert_allclose(got[m], want[m], rtol=2e-5, atol=1e-4)


def test_feature_depths_empty_cloud():
    F = 16
    fn = np.zeros((F, 2), np.float32)
    fv = np.ones(F, bool)
    pts = np.zeros((64, 3), np.float32)
    val = np.zeros(64, bool)
    got = np.asarray(feature_depths(
        jnp.asarray(fn), jnp.asarray(fv), jnp.asarray(pts), jnp.asarray(val)))
    assert (got == -1.0).all()
