"""Lidar front-end kernels vs tiny NumPy oracles (SURVEY.md §4 item 1)."""

import numpy as np
import jax.numpy as jnp

from lvislam_tpu.ops import pointcloud as pc
from lvislam_tpu.ops import loam


def test_livox_columns():
    ring = jnp.array([0, 1, 0, 0, 1, 2, 0], dtype=jnp.int32)
    valid = jnp.array([1, 1, 1, 0, 1, 1, 1], dtype=bool)
    cols = np.asarray(pc.livox_columns(ring, valid, 4))
    # per-ring arrival counters (invalid point does not advance its ring)
    np.testing.assert_array_equal(cols[[0, 1, 2, 4, 5, 6]], [0, 0, 1, 1, 0, 2])


def test_project_first_wins(rng):
    n_scan, h = 2, 16
    xyz = np.array(
        [
            [5.0, 0, 0],  # ring0 col0
            [6.0, 0, 0],  # ring0 col1
            [0.5, 0, 0],  # too close -> dropped
            [7.0, 0, 0],  # ring1 col0
            [200.0, 0, 0],  # too far -> dropped
            [8.0, 0, 0],  # ring0 col2
        ]
    )
    ring = np.array([0, 0, 0, 1, 1, 0], np.int32)
    valid = np.ones(6, bool)
    r_img, xyz_img, _, v_img, _ = pc.project_to_range_image(
        jnp.array(xyz), jnp.zeros(6), jnp.array(ring), jnp.array(valid),
        n_scan, h, 1.0, 100.0,
    )
    r_img = np.asarray(r_img)
    v_img = np.asarray(v_img)
    assert v_img[0, :3].all() and not v_img[0, 3:].any()
    np.testing.assert_allclose(r_img[0, :3], [5, 6, 8])
    assert v_img[1, 0] and r_img[1, 0] == 7
    assert not v_img[1, 1]


def test_project_compact_unique_path_matches_general(rng):
    """The livox fast path (counter columns are unique per ring, so the
    dedup scatter-min and the compaction scatter collapse into one
    unique-index scatter) must match the general collision-handling path
    on every output, junk slots excluded."""
    P, N, H = 2000, 4, 600
    xyz = rng.uniform(-30, 30, (P, 3)).astype(np.float32)
    ring = rng.integers(0, N, P).astype(np.int32)
    valid = rng.random(P) > 0.05
    inten = rng.random(P).astype(np.float32)
    args = (jnp.asarray(xyz), jnp.asarray(inten), jnp.asarray(ring),
            jnp.asarray(valid), N, H, 1.0, 25.0)
    u = pc.project_compact(*args)  # columns=None -> unique fast path
    r = np.linalg.norm(xyz, axis=-1)
    ok = valid & (r >= 1.0) & (r <= 25.0)
    cols = pc.livox_columns(jnp.asarray(ring), jnp.asarray(ok), N)
    g = pc.project_compact(*args, columns=cols)  # general path
    fv = np.asarray(u[4])
    np.testing.assert_array_equal(fv, np.asarray(g[4]))
    for i in range(8):
        a, b = np.asarray(u[i]), np.asarray(g[i])
        if i in (0, 1):  # xyz / intensity carry junk in masked slots
            m = fv[:, None] if a.ndim == 2 else fv
            a, b = np.where(m, a, 0), np.where(m, b, 0)
        np.testing.assert_allclose(a, b)


def test_voxel_downsample_matches_oracle(rng):
    n = 500
    xyz = rng.uniform(-5, 5, size=(n, 3)).astype(np.float32)
    valid = rng.random(n) > 0.1
    leaf = 0.7
    out_xyz, out_valid, _ = pc.voxel_downsample(
        jnp.array(xyz), jnp.array(valid), leaf, capacity=1024
    )
    out_xyz = np.asarray(out_xyz)[np.asarray(out_valid)]
    # oracle: centroid per voxel
    vox = {}
    for p, v in zip(xyz, valid):
        if not v:
            continue
        key = tuple(np.floor(p / leaf).astype(int))
        vox.setdefault(key, []).append(p)
    want = np.array(sorted([np.mean(v, axis=0) for v in vox.values()], key=tuple))
    got = np.array(sorted(out_xyz, key=tuple))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_voxel_downsample_dense_matches_sort_path(rng):
    # the small-P dense (sort-free) path must produce the same voxel set
    # as the large-P sort path, up to output ordering
    n = 1500
    xyz = rng.uniform(-8, 8, size=(n, 3)).astype(np.float32)
    inten = rng.uniform(0, 100, size=n).astype(np.float32)
    valid = rng.random(n) > 0.2
    leaf = 0.5
    dx, dv, di = pc._voxel_downsample_dense(
        jnp.array(xyz), jnp.array(valid), leaf, 2048, jnp.array(inten))
    sx, sv, si = pc.voxel_downsample(
        jnp.concatenate([jnp.array(xyz)] * 4)[: n * 4 - 1],
        jnp.concatenate([jnp.array(valid), jnp.zeros(n * 3 - 1, bool)]),
        leaf, 2048,
        jnp.concatenate([jnp.array(inten)] * 4)[: n * 4 - 1],
    )  # padded past 4096 to force the sort path on the same points
    d = np.c_[np.asarray(dx)[np.asarray(dv)], np.asarray(di)[np.asarray(dv)]]
    s = np.c_[np.asarray(sx)[np.asarray(sv)], np.asarray(si)[np.asarray(sv)]]
    assert d.shape == s.shape
    np.testing.assert_allclose(
        np.array(sorted(d, key=tuple)), np.array(sorted(s, key=tuple)),
        atol=1e-3)


def test_compact_rings():
    valid = jnp.array(
        [[1, 0, 1, 1, 0, 0, 1, 0], [0, 1, 1, 0, 0, 0, 0, 0]], dtype=bool
    )
    order, counts, start_idx, end_idx = pc.compact_rings(valid, 8)
    np.testing.assert_array_equal(np.asarray(counts), [4, 2])
    np.testing.assert_array_equal(np.asarray(order)[0, :4], [0, 2, 3, 6])
    np.testing.assert_array_equal(np.asarray(order)[1, :2], [1, 2])
    np.testing.assert_array_equal(np.asarray(start_idx), [4, 8])  # count-1+5
    np.testing.assert_array_equal(np.asarray(end_idx), [-2, 0])  # count-1-5

    img = jnp.arange(16, dtype=jnp.float32).reshape(2, 8)
    flat, fvalid = pc.gather_compacted(order, counts, img)
    np.testing.assert_array_equal(np.asarray(flat)[:4], [0, 2, 3, 6])
    np.testing.assert_array_equal(np.asarray(flat)[8:10], [9, 10])
    assert np.asarray(fvalid)[:4].all() and not np.asarray(fvalid)[4:8].any()


def test_curvature_stencil(rng):
    r = rng.uniform(1, 10, size=64).astype(np.float32)
    valid = np.ones(64, bool)
    c = np.asarray(loam.curvature(jnp.array(r), jnp.array(valid)))
    for i in range(2, 62):
        d = r[i - 2] + r[i - 1] - 4 * r[i] + r[i + 1] + r[i + 2]
        np.testing.assert_allclose(c[i], d * d, rtol=2e-5)


def test_occlusion_oracle(rng):
    n = 128
    r = rng.uniform(2, 20, size=n).astype(np.float32)
    r[40:45] = 3.0
    r[45:50] = 10.0  # occlusion boundary at 44/45
    col = np.arange(n, dtype=np.int32)
    valid = np.ones(n, bool)
    got = np.asarray(
        loam.occlusion_mask(jnp.array(r), jnp.array(col), jnp.array(valid))
    )
    picked = np.zeros(n, bool)
    for i in range(5, n - 6):
        d1, d2 = r[i], r[i + 1]
        if abs(col[i + 1] - col[i]) < 10:
            if d1 - d2 > 0.3:
                picked[i - 1] = picked[i] = True
            elif d2 - d1 > 0.3:
                picked[i + 1] = picked[i + 2] = True
        if abs(r[i - 1] - r[i]) > 0.1 * r[i] and abs(r[i + 1] - r[i]) > 0.1 * r[i]:
            picked[i] = True
    np.testing.assert_array_equal(got[6:n - 7], picked[6:n - 7])


def greedy_edges_oracle(curv, col, suppressed, start, end, thr, max_pick=40, sectors=6):
    P = len(curv)
    picked = np.zeros(P, bool)
    blocked = suppressed.copy()
    for r in range(len(start)):
        for j in range(sectors):
            sp = (start[r] * (sectors - j) + end[r] * j) // sectors
            ep = (start[r] * (sectors - 1 - j) + end[r] * (j + 1)) // sectors - 1
            if sp >= ep:
                continue
            order = np.argsort(curv[sp : ep + 1], kind="stable")[::-1] + sp
            n = 0
            for ind in order:
                if blocked[ind] or curv[ind] <= thr:
                    continue
                n += 1
                if n > max_pick:
                    break
                picked[ind] = True
                blocked[ind] = True
                for l in range(1, 6):
                    if ind + l >= P or abs(col[ind + l] - col[ind + l - 1]) > 10:
                        break
                    blocked[ind + l] = True
                for l in range(1, 6):
                    if ind - l < 0 or abs(col[ind - l] - col[ind - l + 1]) > 10:
                        break
                    blocked[ind - l] = True
    return picked


def test_select_edges_matches_greedy(rng):
    P = 256
    curv = rng.uniform(0, 5, size=P).astype(np.float32)
    # make values unique so tie-breaking can't differ
    curv += np.arange(P) * 1e-4
    col = np.arange(P, dtype=np.int32)
    col[100:] += 20  # a column gap
    suppressed = rng.random(P) < 0.1
    valid = np.ones(P, bool)
    start = np.array([4])
    end = np.array([P - 6])
    got = np.asarray(
        loam.select_edges(
            jnp.array(curv), jnp.array(col), jnp.array(suppressed),
            jnp.array(valid), jnp.array(start), jnp.array(end), 1.0,
            max_edges_per_sector=40,
        )
    )
    want = greedy_edges_oracle(curv, col, suppressed, start, end, 1.0)
    np.testing.assert_array_equal(got, want)


def test_voxel_downsample_center_keeps_nearest_on_overflow():
    """Capacity overflow with `center` must keep the voxels NEAREST the
    center (the loop-closure submap semantics): a key-ordered drop keeps a
    spatially biased slab and the ICP verifier then sees no overlap."""
    rng = np.random.default_rng(3)
    # 8192 points spread over a 40 m square: ~1600 occupied 1 m voxels,
    # capacity 256 forces a deep overflow
    xyz = rng.uniform(-20, 20, (8192, 3)).astype(np.float32)
    xyz[:, 2] = 0.0
    valid = np.ones(8192, bool)
    center = np.array([5.0, -3.0, 0.0], np.float32)
    out, ov, _ = pc.voxel_downsample(
        jnp.asarray(xyz), jnp.asarray(valid), 1.0, 256,
        center=jnp.asarray(center),
    )
    kept = np.asarray(out)[np.asarray(ov)]
    assert len(kept) == 256
    d = np.linalg.norm(kept - center, axis=-1)
    # all kept voxels lie within the radius that ~256 nearest voxels span
    # (256 voxels of 1 m^2 in-plane ~ a disc of radius sqrt(256/pi) ~ 9 m)
    assert d.max() < 11.0, f"kept voxels reach {d.max():.1f} m from center"
    # and they are centroids of their voxel (oracle spot check on one voxel)
    v0 = np.floor(kept[0]).astype(int)
    sel = (np.floor(xyz) == v0).all(-1)
    np.testing.assert_allclose(kept[0], xyz[sel].mean(0), atol=1e-5)
