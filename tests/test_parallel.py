"""Multi-chip sharding tests on the 8-device virtual CPU mesh: map-sharded
kNN must equal the single-device exact kNN; the batched data-parallel LIO
step must run independent sequences in lockstep."""

import numpy as np
import jax
import jax.numpy as jnp

from lvislam_tpu.ops import scan2map
from lvislam_tpu.parallel import mesh as mesh_mod, sharded_knn, batch_replay
from lvislam_tpu.models.lio import mapping
from lvislam_tpu.models.lio.frontend import FeatureResult


def cpu_mesh(n=8, map_par=2):
    devs = jax.devices("cpu")[:n]
    return mesh_mod.make_mesh(n, map_parallel=map_par, devices=devs)


def test_sharded_knn_matches_exact(rng):
    mesh = cpu_mesh(8, map_par=4)
    Q, M = 128, 1024
    q = jnp.asarray(rng.normal(size=(Q, 3)), jnp.float32)
    m = jnp.asarray(rng.normal(size=(M, 3)), jnp.float32)
    qv = jnp.ones(Q, bool)
    mv = jnp.asarray(rng.random(M) > 0.1)

    ref_i, ref_d = scan2map.knn(q, qv, m, mv, k=5)

    from jax.sharding import NamedSharding, PartitionSpec as P

    m_sh = jax.device_put(m, NamedSharding(mesh, P("map")))
    mv_sh = jax.device_put(mv, NamedSharding(mesh, P("map")))
    fn = sharded_knn.sharded_knn(mesh, k=5, chunk=256)
    with mesh:
        idx, d = jax.jit(fn)(q, qv, m_sh, mv_sh)
    np.testing.assert_allclose(
        np.sort(np.asarray(d), axis=1), np.sort(np.asarray(ref_d), axis=1),
        rtol=1e-4, atol=1e-4,
    )
    # the same neighbor sets (order may differ on ties)
    same = [
        set(np.asarray(idx)[i]) == set(np.asarray(ref_i)[i]) for i in range(Q)
    ]
    assert np.mean(same) > 0.98


def test_batched_lio_step(rng):
    mesh = cpu_mesh(8, map_par=1)
    B = mesh.shape["batch"]
    caps = mapping.LioCaps(
        max_keyframes=16, kf_corner=64, kf_surf=128, sel_keyframes=4,
        map_corner=256, map_surf=512, scan_corner=64, scan_surf=128,
        max_loops=2, max_gps=2, loop_submap=128, icp_iters=2,
    )
    params = mapping.LioParams()
    state = batch_replay.batched_lio_init(caps, B, mesh)
    scan = dict(
        stamp=jnp.full((B,), 0.1),
        imu_available=jnp.ones(B, bool),
        imu_rpy_init=jnp.zeros((B, 3)),
        odom_available=jnp.zeros(B, bool),
        odom_trans=jnp.zeros((B, 3)),
        odom_quat=jnp.tile(jnp.array([1.0, 0, 0, 0]), (B, 1)),
        odom_reset_id=jnp.zeros(B, jnp.int32),
    )
    # give each sequence DIFFERENT scan content
    feats = FeatureResult(
        corner_xyz=jnp.asarray(rng.uniform(-5, 5, (B, caps.scan_corner, 3)), jnp.float32),
        corner_valid=jnp.ones((B, caps.scan_corner), bool),
        surf_xyz=jnp.asarray(rng.uniform(-5, 5, (B, caps.scan_surf, 3)), jnp.float32),
        surf_valid=jnp.ones((B, caps.scan_surf), bool),
        num_corner=jnp.full(B, caps.scan_corner, jnp.int32),
        num_surf=jnp.full(B, caps.scan_surf, jnp.int32),
    )
    step = batch_replay.make_batched_step(caps, params, mesh)
    with mesh:
        state2, out = step(state, scan, feats)
    assert int(np.asarray(state2.kf_count).sum()) == B  # each took a keyframe
    # sequences stay independent: different scans -> different stored clouds
    kf0 = np.asarray(state2.kf_surf[0, 0])
    kf1 = np.asarray(state2.kf_surf[1, 0])
    assert not np.allclose(kf0, kf1)


def test_sharded_scan_to_map_matches_single_device(rng):
    """The map-sharded GN (`parallel/sharded_scan2map.py`) must reproduce
    the single-device `scan_to_map` solve exactly (same correspondences —
    the candidate merge is over exact per-shard top-5 sets)."""
    from lvislam_tpu.parallel import sharded_scan2map
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = cpu_mesh(8, map_par=4)

    # a synthetic world with real line/plane structure so the GN converges
    C, S, Mc, Ms = 192, 256, 1536, 2048
    # map: corner points along vertical lines, surf points on planes
    lines = rng.uniform(-6, 6, (8, 2))
    mc = np.stack([
        np.repeat(lines[:, 0], Mc // 8),
        np.repeat(lines[:, 1], Mc // 8),
        np.tile(np.linspace(-2, 2, Mc // 8), 8),
    ], 1) + rng.normal(0, 0.01, (Mc, 3))
    z0 = rng.uniform(-1, 1, 4)
    ms = np.concatenate([
        np.stack([
            rng.uniform(-8, 8, Ms // 4), rng.uniform(-8, 8, Ms // 4),
            np.full(Ms // 4, z) + rng.normal(0, 0.01, Ms // 4),
        ], 1) for z in z0
    ])
    # scan: samples of the same structures, observed from a small offset pose
    true_x6 = np.array([0.02, -0.01, 0.03, 0.2, -0.1, 0.05], np.float32)
    from lvislam_tpu.core import lie as lie_mod
    Rm = np.asarray(lie_mod.ypr_to_matrix(jnp.array(
        [true_x6[2], true_x6[1], true_x6[0]]) * (180.0 / np.pi)))
    ci = rng.integers(0, Mc, C)
    cp = (mc[ci] + rng.normal(0, 0.005, (C, 3)) - true_x6[3:6]) @ Rm
    si = rng.integers(0, Ms, S)
    sp = (ms[si] + rng.normal(0, 0.005, (S, 3)) - true_x6[3:6]) @ Rm

    args = (
        jnp.zeros(6, jnp.float32),
        jnp.asarray(cp, jnp.float32), jnp.ones(C, bool),
        jnp.asarray(sp, jnp.float32), jnp.ones(S, bool),
        jnp.asarray(mc, jnp.float32), jnp.ones(Mc, bool),
        jnp.asarray(ms, jnp.float32), jnp.ones(Ms, bool),
    )
    ref = scan2map.scan_to_map(*args, max_iters=10, eigen_thresh=10.0)

    fn = sharded_scan2map.sharded_scan_to_map(mesh, max_iters=10,
                                              eigen_thresh=10.0)
    sh_map = NamedSharding(mesh, P("map"))
    sharded_args = args[:5] + (
        jax.device_put(args[5], sh_map), jax.device_put(args[6], sh_map),
        jax.device_put(args[7], sh_map), jax.device_put(args[8], sh_map),
    )
    with mesh:
        got = fn(*sharded_args)

    # the solve must actually do something and recover the pose
    assert float(jnp.linalg.norm(ref.x6 - jnp.asarray(true_x6))) < 0.02
    # fp32 reduction order differs between the sharded per-shard distance
    # matmuls and the monolithic one; near-tie neighbors can swap, so the
    # solves agree to ~1e-4 rad/m rather than bit-exactly
    np.testing.assert_allclose(
        np.asarray(got.x6), np.asarray(ref.x6), rtol=0, atol=5e-4)
    assert abs(int(got.num_residuals) - int(ref.num_residuals)) <= 2
    assert bool(got.converged) == bool(ref.converged)
