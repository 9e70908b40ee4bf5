"""Fused Pallas query tail (`ops.pallas_knn`) must select bit-identically
to the XLA `voxel_hash.query` path (same scaled-domain op order)."""

import numpy as np
import jax.numpy as jnp

from lvislam_tpu.ops import voxel_hash as vh


def _parity(T, B, M=4096, Q=256, seed=0):
    rng = np.random.default_rng(seed)
    pts = jnp.asarray(rng.uniform(-10, 10, (M, 3)), jnp.float32)
    val = jnp.asarray(rng.random(M) > 0.1)
    h = vh.build(pts, val, 1.0, T, B)
    q = jnp.asarray(
        (pts[rng.integers(0, M, Q)] + rng.normal(0, 0.4, (Q, 3))), jnp.float32
    )
    i1, d1 = vh.query(h, q, 5)
    i2, d2 = vh.query_fused(h, q, 5, interpret=True)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-6)


def test_fused_query_parity_b16():
    _parity(1 << 12, 16)


def test_fused_query_parity_b32():
    _parity(1 << 11, 32, seed=1)


def test_fused_query_padding_path():
    # Q not a multiple of the kernel block exercises the pad lanes; queries
    # far from any point exercise the <k-candidates -1 fallback
    rng = np.random.default_rng(2)
    pts = jnp.asarray(rng.uniform(-5, 5, (512, 3)), jnp.float32)
    h = vh.build(pts, jnp.ones(512, bool), 1.0, 1 << 10, 16)
    q = jnp.asarray(
        np.concatenate([rng.uniform(-5, 5, (30, 3)),
                        np.full((3, 3), 50.0)]), jnp.float32
    )
    i1, d1 = vh.query(h, q, 5)
    i2, d2 = vh.query_fused(h, q, 5, interpret=True)
    # far queries: both report no neighbors
    assert (np.asarray(d1)[30:] > 1e9).all()
    assert (np.asarray(d2)[30:] > 1e9).all()
    np.testing.assert_array_equal(np.asarray(i1)[:30], np.asarray(i2)[:30])
    np.testing.assert_allclose(
        np.asarray(d1)[:30], np.asarray(d2)[:30], rtol=1e-6
    )


def test_gather_once_rescoring():
    """query_gather + query_score must equal query_fused at the gather
    position, and remain exact after sub-half-cell query motion."""
    rng = np.random.default_rng(4)
    pts = jnp.asarray(rng.uniform(-8, 8, (4096, 3)), jnp.float32)
    h = vh.build(pts, jnp.ones(4096, bool), 1.0, 1 << 12, 16)
    q0 = jnp.asarray(rng.uniform(-6, 6, (128, 3)), jnp.float32)
    g = vh.query_gather(h, q0)

    i0, d0 = vh.query_score(h, g, q0, 5, interpret=True)
    i_ref, d_ref = vh.query_fused(h, q0, 5, interpret=True)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i_ref))

    # after motion, rescoring is exact for queries that stayed inside
    # their gather-time cell (the documented bound)
    q1 = q0 + jnp.asarray(rng.uniform(-0.28, 0.28, (128, 3)), jnp.float32)
    same_cell = np.asarray(
        (jnp.floor(q1 / h.cell) == jnp.floor(q0 / h.cell)).all(axis=1)
    )
    assert same_cell.sum() > 30
    i1, d1 = vh.query_score(h, g, q1, 5, interpret=True)
    i1f, d1f = vh.query_fused(h, q1, 5, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(i1)[same_cell], np.asarray(i1f)[same_cell]
    )
    np.testing.assert_allclose(
        np.asarray(d1)[same_cell], np.asarray(d1f)[same_cell], rtol=1e-6
    )
    # boundary-crossers: every returned neighbor must still be a real point
    # with a correctly computed distance (subset semantics, no corruption)
    cross = ~same_cell
    ic, dc = np.asarray(i1)[cross], np.asarray(d1)[cross]
    pts_np = np.asarray(pts)
    for r in range(cross.sum()):
        for c in range(5):
            if ic[r, c] >= 0 and dc[r, c] < 1e9:
                d_true = ((pts_np[ic[r, c]] - np.asarray(q1)[cross][r]) ** 2).sum()
                assert abs(d_true - dc[r, c]) < 1e-2


def test_scan2map_gather_once_matches_full():
    """scan_to_map_hashed(gather_once=True) must converge to the same pose
    as the per-iteration-refresh path on a realistic registration."""
    from lvislam_tpu.ops import scan2map

    rng = np.random.default_rng(5)
    # a structured scene: two walls + floor
    n = 3000
    wall1 = np.stack([rng.uniform(-10, 10, n), np.full(n, 5.0),
                      rng.uniform(0, 3, n)], 1)
    wall2 = np.stack([np.full(n, -6.0), rng.uniform(-10, 10, n),
                      rng.uniform(0, 3, n)], 1)
    floor = np.stack([rng.uniform(-10, 10, n), rng.uniform(-10, 10, n),
                      np.zeros(n)], 1)
    map_surf = jnp.asarray(np.concatenate([wall1, wall2, floor]), jnp.float32)
    edge = np.stack([np.full(400, -6.0), np.full(400, 5.0),
                     np.linspace(0, 3, 400)], 1)
    map_corner = jnp.asarray(edge + rng.normal(0, 0.01, edge.shape), jnp.float32)

    h_c = vh.build(map_corner, jnp.ones(len(edge), bool), 1.0, 1 << 10, 32)
    h_s = vh.build(map_surf, jnp.ones(3 * n, bool), 1.0, 1 << 13, 16)

    # scan = subsampled map points viewed from a perturbed pose
    sel_s = rng.choice(3 * n, 1024, replace=False)
    sel_c = rng.choice(len(edge), 128, replace=False)
    from scipy.spatial.transform import Rotation as Rsc
    x6_true = np.zeros(6, np.float32)
    dR = Rsc.from_euler("zyx", [2.0, -1.0, 1.5], degrees=True).as_matrix()
    dt_ = np.array([0.15, -0.1, 0.05], np.float32)
    surf_scan = jnp.asarray((np.asarray(map_surf)[sel_s] - dt_) @ dR, jnp.float32)
    corner_scan = jnp.asarray((np.asarray(map_corner)[sel_c] - dt_) @ dR, jnp.float32)

    kw = dict(max_iters=15, eigen_thresh=25.0)
    res_full = scan2map.scan_to_map_hashed(
        jnp.zeros(6), corner_scan, jnp.ones(128, bool), surf_scan,
        jnp.ones(1024, bool), map_corner, map_surf, h_c, h_s,
        nn_refresh_every=1, **kw)
    res_cached = scan2map.scan_to_map_hashed(
        jnp.zeros(6), corner_scan, jnp.ones(128, bool), surf_scan,
        jnp.ones(1024, bool), map_corner, map_surf, h_c, h_s,
        use_pallas=True, gather_once=True, pallas_interpret=True, **kw)
    # both must recover the perturbation; poses agree to mm/mrad
    assert float(jnp.linalg.norm(res_full.x6[3:] - res_cached.x6[3:])) < 5e-3
    assert float(jnp.linalg.norm(res_full.x6[:3] - res_cached.x6[:3])) < 2e-3
    # cached gather + re-score only on the refresh schedule (the bench
    # operating point: the HBM gather leaves the loop AND off-refresh
    # iterations skip the tail kernel too)
    res_sched = scan2map.scan_to_map_hashed(
        jnp.zeros(6), corner_scan, jnp.ones(128, bool), surf_scan,
        jnp.ones(1024, bool), map_corner, map_surf, h_c, h_s,
        use_pallas=True, gather_once=True, pallas_interpret=True,
        nn_refresh_every=2, **kw)
    assert float(jnp.linalg.norm(res_full.x6[3:] - res_sched.x6[3:])) < 5e-3
    assert float(jnp.linalg.norm(res_full.x6[:3] - res_sched.x6[:3])) < 2e-3
