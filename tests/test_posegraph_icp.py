"""Pose-graph GN+PCG solver and ICP tests (SURVEY.md §4 item 2)."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as Rsc

from lvislam_tpu.ops import posegraph as pg
from lvislam_tpu.ops import icp
from lvislam_tpu.core import lie


def build_circle_graph(n=40, drift=0.01, seed=0, loop_w=1e3, prior_w=None):
    """Ground-truth circle trajectory; odometry with yaw drift; one loop
    factor closing the circle."""
    rng = np.random.default_rng(seed)
    # ground truth poses on a circle
    theta = np.linspace(0, 2 * np.pi, n, endpoint=False)
    radius = 10.0
    t_true = np.stack([radius * np.cos(theta), radius * np.sin(theta), 0 * theta], -1)
    yaw = theta + np.pi / 2
    q_true = np.stack(
        [np.cos(yaw / 2), 0 * yaw, 0 * yaw, np.sin(yaw / 2)], -1
    )  # wxyz, rotation about z

    def rel(i, j):
        Ri = Rsc.from_quat(np.roll(q_true[i], -1))
        Rj = Rsc.from_quat(np.roll(q_true[j], -1))
        R_ij = Ri.inv() * Rj
        t_ij = Ri.inv().apply(t_true[j] - t_true[i])
        q = np.roll(R_ij.as_quat(), 1)
        return t_ij, q

    g = pg.empty_graph(64, 128, 16)
    # integrate noisy odometry for initial values
    est_t = [t_true[0]]
    est_q = [q_true[0]]
    bf = {"i": [], "j": [], "t": [], "q": [], "w": []}
    for k in range(n - 1):
        t_ij, q_ij = rel(k, k + 1)
        # corrupt the measurement with yaw drift
        dq = np.roll(Rsc.from_euler("z", drift).as_quat(), 1)
        q_meas = np.asarray(
            lie.quat_multiply(jnp.array(q_ij), jnp.array(dq))
        )
        bf["i"].append(k)
        bf["j"].append(k + 1)
        bf["t"].append(t_ij)
        bf["q"].append(q_meas)
        bf["w"].append(pg.ODOM_SQRTW)
        tq = lie.se3_compose(
            jnp.array(est_t[-1]), jnp.array(est_q[-1]), jnp.array(t_ij), jnp.array(q_meas)
        )
        est_t.append(np.asarray(tq[0]))
        est_q.append(np.asarray(tq[1]))
    # loop factor: last -> first with the TRUE relative pose, strong weight
    t_l, q_l = rel(n - 1, 0)
    bf["i"].append(n - 1)
    bf["j"].append(0)
    bf["t"].append(t_l)
    bf["q"].append(q_l)
    bf["w"].append((loop_w,) * 6)

    F = len(bf["i"])
    g = g._replace(
        trans=g.trans.at[:n].set(jnp.array(np.stack(est_t))),
        quat=g.quat.at[:n].set(jnp.array(np.stack(est_q))),
        node_valid=g.node_valid.at[:n].set(True),
        bf_i=g.bf_i.at[:F].set(jnp.array(bf["i"], dtype=jnp.int32)),
        bf_j=g.bf_j.at[:F].set(jnp.array(bf["j"], dtype=jnp.int32)),
        bf_trans=g.bf_trans.at[:F].set(jnp.array(np.stack(bf["t"]), dtype=jnp.float32)),
        bf_quat=g.bf_quat.at[:F].set(jnp.array(np.stack(bf["q"]), dtype=jnp.float32)),
        bf_sqrtw=g.bf_sqrtw.at[:F].set(jnp.array(np.stack(bf["w"]), dtype=jnp.float32)),
        bf_valid=g.bf_valid.at[:F].set(True),
        prior_trans=jnp.array(t_true[0], dtype=jnp.float32),
        prior_quat=jnp.array(q_true[0], dtype=jnp.float32),
        prior_sqrtw=jnp.array(prior_w if prior_w is not None else pg.PRIOR_SQRTW, dtype=jnp.float32),
    )
    return g, t_true, q_true, np.stack(est_t)


def test_loop_closure_corrects_drift():
    # strong loop factor + pinned first pose; systematic yaw drift of
    # 0.01 rad/step accumulates ~4 m of open-loop error on a 10 m circle
    g, t_true, q_true, est_t = build_circle_graph(
        drift=0.01, loop_w=1e3, prior_w=(1e3,) * 6
    )
    open_err = np.linalg.norm(est_t[-1] - t_true[-1])
    assert open_err > 1.0
    g2 = pg.optimize(g, gn_iters=12, pcg_iters=96)
    t_opt = np.asarray(g2.trans[:40])
    err = np.linalg.norm(t_opt - t_true, axis=1)
    assert err.max() < 0.5, err.max()
    e0 = float(pg.total_error(g))
    e1 = float(pg.total_error(g2))
    assert e1 < e0 * 0.1


def test_prior_only_graph():
    g = pg.empty_graph(8, 8, 4)
    g = g._replace(
        node_valid=g.node_valid.at[0].set(True),
        trans=g.trans.at[0].set(jnp.array([1.0, 2.0, 3.0])),
        prior_trans=jnp.array([0.5, 2.0, 3.0]),
        prior_quat=lie.quat_identity(),
        prior_sqrtw=jnp.array(pg.PRIOR_SQRTW, dtype=jnp.float32),
    )
    g2 = pg.optimize(g, gn_iters=4, pcg_iters=16)
    # prior translation weight is tiny (variance 1e8) -> node barely moves
    np.testing.assert_allclose(np.asarray(g2.trans[0]), [1.0, 2.0, 3.0], atol=1e-2)


def _corridor_state(mapping, caps, with_corner_target=True):
    """Two keyframes revisiting the same spot in a corridor along x: walls
    (surf, y=±2) constrain nothing along x when sampled independently;
    corner posts at distinct x lock the axis. The current keyframe's
    ESTIMATED pose carries a +0.6 m along-corridor error."""
    rng_t = np.random.default_rng(1)
    rng_s = np.random.default_rng(2)

    def walls(rng, n):
        x = rng.uniform(-8, 8, n)
        y = np.where(rng.uniform(size=n) < 0.5, -2.0, 2.0)
        z = rng.uniform(0, 2.5, n)
        return np.stack([x, y, z], -1).astype(np.float32)

    def posts(rng, per=12):
        pts = []
        for px in (-6.0, -3.0, 0.0, 3.0, 6.0):
            for py in (-1.5, 1.5):
                z = rng.uniform(0, 2.5, per)
                pts.append(np.stack([np.full(per, px), np.full(per, py), z], -1))
        return np.concatenate(pts).astype(np.float32)

    state = mapping.lio_init(caps)
    S, C = caps.kf_surf, caps.kf_corner
    surf_t, surf_s = walls(rng_t, S), walls(rng_s, S)
    corn_t, corn_s = posts(rng_t), posts(rng_s)
    nc = corn_t.shape[0]
    kf_surf = state.kf_surf.at[0].set(surf_t).at[4].set(surf_s)
    kf_sv = state.kf_surf_valid.at[0].set(True).at[4].set(True)
    kf_corn = state.kf_corner.at[0, :nc].set(corn_t).at[4, :nc].set(corn_s)
    kf_cv = state.kf_corner_valid.at[4, :nc].set(True)
    if with_corner_target:
        kf_cv = kf_cv.at[0, :nc].set(True)
    kf_trans = state.kf_trans.at[4].set(jnp.array([0.6, 0.0, 0.0]))
    return state._replace(
        kf_surf=kf_surf, kf_surf_valid=kf_sv,
        kf_corner=kf_corn, kf_corner_valid=kf_cv,
        kf_trans=kf_trans, kf_count=jnp.int32(5),
    )


def test_loop_icp_corner_target_locks_corridor_axis():
    """`loopFindNearKeyframes` stacks corner + surf (`mapOptimization.cpp:
    694-702`); a surf-only target lets point-to-point ICP slide along a
    corridor. With corners the 0.6 m along-axis pose error is recovered."""
    from lvislam_tpu.models.lio import mapping

    caps = mapping.LioCaps(
        max_keyframes=8, kf_corner=128, kf_surf=512, sel_keyframes=4,
        map_corner=512, map_surf=2048, scan_corner=128, scan_surf=512,
        max_loops=2, max_gps=2, loop_submap=2048, icp_iters=25,
        corner_hash_size=1 << 8, surf_hash_size=1 << 10, hash_bucket=8,
        surf_hash_bucket=8,
    )
    params = mapping.LioParams(historyKeyframeSearchNum=1)

    st = _corridor_state(mapping, caps, with_corner_target=True)
    st2, res = mapping._loop_icp(st, jnp.int32(4), jnp.int32(0), caps, params)
    assert bool(res.found), float(res.fitness)
    f = caps.max_keyframes  # first loop slot
    ti = np.asarray(st2.graph.bf_trans[f])
    # corrected relative pose cur->cand should be ~identity (revisit)
    assert np.linalg.norm(ti) < 0.15, ti

    # regression: surf-only target (the pre-fix behavior) slides along x —
    # ICP either keeps most of the 0.6 m error or rejects the loop
    st_s = _corridor_state(mapping, caps, with_corner_target=False)
    st2_s, res_s = mapping._loop_icp(
        st_s, jnp.int32(4), jnp.int32(0), caps, params
    )
    if bool(res_s.found):
        ti_s = np.asarray(st2_s.graph.bf_trans[f])
        assert abs(ti_s[0]) > 0.3, ti_s


def test_icp_recovers_transform(rng):
    pts = rng.uniform(-5, 5, size=(800, 3)).astype(np.float32)
    R_true = Rsc.from_euler("xyz", [4, -6, 12], degrees=True)
    t_true = np.array([0.4, -0.3, 0.2], np.float32)
    dst = (R_true.apply(pts) + t_true).astype(np.float32)
    res = icp.icp_point2point(
        jnp.array(pts), jnp.ones(800, bool),
        jnp.array(dst), jnp.ones(800, bool),
        jnp.zeros(3), lie.quat_identity(),
        max_corr_dist=5.0, iters=30, chunk=1024,
    )
    R_got = Rsc.from_quat(np.roll(np.asarray(res.quat), -1))
    assert (R_true.inv() * R_got).magnitude() < 1e-3
    np.testing.assert_allclose(np.asarray(res.trans), t_true, atol=1e-3)
    assert float(res.fitness) < 1e-5
