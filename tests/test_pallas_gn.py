"""Pallas fused coeffs+GN reduction (ops.pallas_gn) vs the XLA reference
path (scan2map.corner_coeffs_nbrs / surf_coeffs_nbrs + gn_update row
assembly). Interpret mode on CPU; the selection logic and closed-form
small-matrix math must agree, the final sums up to reduction order."""

import numpy as np
import jax.numpy as jnp

from lvislam_tpu.ops import pallas_gn, scan2map


def _pose(x6):
    Rm = scan2map.lie.ypr_to_matrix(
        jnp.stack([x6[2], x6[1], x6[0]]) * (180.0 / np.pi))
    return Rm, x6[3:6]


def _xla_partials(kind, pw, pl_, valid, nbrs, has, x6):
    if kind == "corner":
        co = scan2map.corner_coeffs_nbrs(pw, valid, nbrs, has)
    else:
        co = scan2map.surf_coeffs_nbrs(pw, pl_, valid, nbrs, has)
    w = co.valid.astype(jnp.float32)
    Jr = scan2map._euler_jacobians(x6, pl_)
    J_ang = jnp.einsum("nj,nja->na", co.normal, Jr)
    J = jnp.concatenate([J_ang, co.normal], axis=-1) * w[:, None]
    b = -co.offset * w
    return J.T @ J, J.T @ b, jnp.sum(co.valid)


def _make_case(kind, rng, N=256):
    """Neighborhoods with a mix of genuinely line-like / plane-like /
    scattered / missing-neighbor cases so every gate fires both ways."""
    pl_ = rng.uniform(-10, 10, (N, 3)).astype(np.float32)
    x6 = rng.uniform(-0.5, 0.5, 6).astype(np.float32)
    Rm, t = _pose(jnp.asarray(x6))
    # the kernel contract: p_world = R p_lidar + t (computed IN-kernel);
    # the XLA reference gets the same pw computed here
    pw = np.asarray(jnp.asarray(pl_) @ Rm.T + t)
    valid = rng.random(N) > 0.1
    t = rng.uniform(-0.4, 0.4, (N, 5, 1)).astype(np.float32)
    if kind == "corner":
        direc = rng.normal(size=(N, 1, 3)).astype(np.float32)
        direc /= np.linalg.norm(direc, axis=-1, keepdims=True)
        nbrs = pw[:, None, :] + t * direc
        nbrs += rng.normal(0, 0.01, nbrs.shape).astype(np.float32)
    else:
        u = rng.normal(size=(N, 1, 3)).astype(np.float32)
        v = rng.normal(size=(N, 1, 3)).astype(np.float32)
        t2 = rng.uniform(-0.4, 0.4, (N, 5, 1)).astype(np.float32)
        nbrs = pw[:, None, :] + t * u + t2 * v
        nbrs += rng.normal(0, 0.005, nbrs.shape).astype(np.float32)
    # shift some neighborhoods off their feature (weight gate), scatter
    # some entirely (eigen gates), drop some neighbors
    nbrs = nbrs + np.where(rng.random((N, 1, 1)) < 0.3,
                           rng.normal(0, 0.5, (N, 1, 3)), 0).astype(np.float32)
    scatter = rng.random(N) < 0.2
    nbrs = np.where(scatter[:, None, None],
                    rng.uniform(-10, 10, nbrs.shape), nbrs).astype(np.float32)
    has = rng.random((N, 5)) > 0.08
    return (jnp.asarray(pw), jnp.asarray(pl_), jnp.asarray(valid),
            jnp.asarray(nbrs), jnp.asarray(has), jnp.asarray(x6))


def _run(kind, rng):
    pw, pl_, valid, nbrs, has, x6 = _make_case(kind, rng)
    H0, g0, n0 = _xla_partials(kind, pw, pl_, valid, nbrs, has, x6)
    jacs = scan2map._euler_jac_mats(x6)
    Rm, t = _pose(x6)
    H1, g1, n1 = pallas_gn.gn_partials(
        pl_, valid, nbrs, has, Rm, t, jacs, kind=kind, interpret=True
    )
    assert int(n0) == int(n1), (kind, int(n0), int(n1))
    scale = max(float(jnp.max(jnp.abs(H0))), 1e-6)
    np.testing.assert_allclose(np.asarray(H1), np.asarray(H0),
                               atol=2e-4 * scale, rtol=2e-4)
    gscale = max(float(jnp.max(jnp.abs(g0))), 1e-6)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               atol=2e-4 * gscale, rtol=2e-4)


def test_corner_partials_match_xla(rng):
    _run("corner", rng)


def test_surf_partials_match_xla(rng):
    _run("surf", rng)


def test_solver_end_to_end_parity(rng):
    """scan_to_map_hashed with use_pallas_gn must converge to the same pose
    as the XLA path on a synthetic registration problem."""
    from lvislam_tpu.ops import voxel_hash as vh

    n_map = 4096
    # a box-ish world: three orthogonal planes + two edges
    pts = []
    g = rng.uniform(-8, 8, (n_map, 2)).astype(np.float32)
    pts.append(np.stack([g[:, 0], g[:, 1], np.zeros(n_map)], -1))
    pts.append(np.stack([g[:, 0], np.full(n_map, -8.0), g[:, 1] * 0.3 + 2], -1))
    pts.append(np.stack([np.full(n_map, 8.0), g[:, 0], g[:, 1] * 0.3 + 2], -1))
    edge_t = rng.uniform(-8, 8, n_map).astype(np.float32)
    pts.append(np.stack([edge_t, np.full(n_map, -8.0), np.full(n_map, 5.0)], -1))
    map_surf = np.concatenate(pts[:3]).astype(np.float32)
    map_corner = pts[3].astype(np.float32)

    ci = rng.choice(len(map_corner), 256, replace=False)
    si = rng.choice(len(map_surf), 1024, replace=False)
    x6_true = np.array([0.02, -0.015, 0.03, 0.2, -0.15, 0.1], np.float32)
    Rm = np.asarray(scan2map.lie.ypr_to_matrix(
        jnp.array([x6_true[2], x6_true[1], x6_true[0]]) * (180.0 / np.pi)))
    corner_scan = ((map_corner[ci] - x6_true[3:6]) @ Rm).astype(np.float32)
    surf_scan = ((map_surf[si] - x6_true[3:6]) @ Rm).astype(np.float32)

    ch = vh.build(jnp.asarray(map_corner),
                  jnp.ones(len(map_corner), bool), cell=1.0,
                  table_size=1 << 12, bucket_cap=16)
    sh = vh.build(jnp.asarray(map_surf), jnp.ones(len(map_surf), bool),
                  cell=1.0, table_size=1 << 13, bucket_cap=16)

    kw = dict(max_iters=12, eigen_thresh=25.0, nn_refresh_every=2,
              use_pallas=True, gather_once=True, pallas_interpret=True)
    args = (jnp.zeros(6), jnp.asarray(corner_scan),
            jnp.ones(256, bool), jnp.asarray(surf_scan),
            jnp.ones(1024, bool), jnp.asarray(map_corner),
            jnp.asarray(map_surf), ch, sh)
    st_x = scan2map.scan_to_map_hashed(*args, **kw)
    st_p = scan2map.scan_to_map_hashed(*args, use_pallas_gn=True, **kw)
    # sanity: the solve moved toward the true pose (the synthetic scene is
    # weakly constrained along tz, so no tight absolute bar here) — the
    # REAL assertion is path-vs-path agreement well below the convergence
    # threshold (0.05 cm / 0.05 deg)
    np.testing.assert_allclose(np.asarray(st_x.x6), x6_true, atol=0.08)
    np.testing.assert_allclose(np.asarray(st_p.x6), np.asarray(st_x.x6),
                               atol=2e-3)
