"""Marginalization correctness: the prior produced by `ba.marginalize_old`
must reproduce, for any perturbation of the kept states, the minimum over
the dropped states of the full included-factor cost (SURVEY.md §4:
"Schur marginalization vs dense elimination")."""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as Rsc

from lvislam_tpu.core import lie
from lvislam_tpu.models.vio import feature_manager as fm
from lvislam_tpu.models.vio import estimator as est
from lvislam_tpu.ops import ba, preintegration as pre
from lvislam_tpu.utils import synthetic as syn


def build_consistent_window(W=4, F=24, seed=0):
    """Exact synthetic window: states on a smooth trajectory, consistent
    preintegrations and projections."""
    rng = np.random.default_rng(seed)
    caps = fm.VioCaps(window=W, max_features=F, imu_buf=16, frame_features=F)
    cfg = ba.BAConfig(window=W, max_features=F, iterations=6,
                      estimate_td=False, estimate_extrinsic=False)
    params = est.VioParams(g_norm=syn.GRAVITY)
    traj = syn.figure8_trajectory(scale=3.0, period=30.0)
    rate, imu_rate = 10.0, 160.0

    Ps, Qs, Vs = [], [], []
    for k in range(W + 1):
        t = k / rate
        p, R = traj.pose(np.array([t]))
        Ps.append(p[0])
        Qs.append(np.roll(Rsc.from_matrix(R[0]).as_quat(), 1))
        Vs.append((traj.pose(np.array([t + 1e-4]))[0][0] - traj.pose(np.array([t - 1e-4]))[0][0]) / 2e-4)
    ws = ba.WindowState(
        Ps=jnp.array(np.stack(Ps), jnp.float32),
        Qs=jnp.array(np.stack(Qs), jnp.float32),
        Vs=jnp.array(np.stack(Vs), jnp.float32),
        Bas=jnp.zeros((W + 1, 3)), Bgs=jnp.zeros((W + 1, 3)),
        tic=jnp.zeros(3), qic=lie.quat_identity(), td=jnp.zeros(()),
    )

    noise = pre.ImuNoise.create(params.acc_n, params.gyr_n, params.acc_w, params.gyr_w)
    pints = []
    for k in range(W):
        n = int(imu_rate / rate)
        ts = (np.arange(k * n, (k + 1) * n) + 1) / imu_rate
        w_, f_ = traj.imu(ts)
        p0 = pre.preint_init(jnp.array(f_[0], jnp.float32), jnp.array(w_[0], jnp.float32),
                             jnp.zeros(3), jnp.zeros(3))
        pints.append(pre.preintegrate(
            p0, jnp.full(n, 1.0 / imu_rate), jnp.array(f_, dtype=jnp.float32),
            jnp.array(w_, dtype=jnp.float32), noise))
    pints = jax.tree.map(lambda *xs: jnp.stack(xs), *pints)

    # landmarks ahead of the camera (cam = body here: qic = I)
    X = np.stack([rng.uniform(2, 8, F), rng.uniform(-3, 3, F), rng.uniform(-1, 1, F)], 1)
    X = (np.asarray(ws.Qs[0]), )  # placeholder no-op
    Xw = []
    R0 = Rsc.from_quat(np.roll(np.asarray(ws.Qs)[0], -1)).as_matrix()
    for i in range(F):
        d = rng.uniform(3, 9)
        n_ = np.array([1.0, rng.uniform(-0.4, 0.4), rng.uniform(-0.3, 0.3)])
        Xw.append(np.asarray(ws.Ps)[0] + R0 @ (n_ / np.linalg.norm(n_) * d))
    Xw = np.stack(Xw)

    obs = np.zeros((F, W + 1, 2), np.float32)
    obs_valid = np.zeros((F, W + 1), bool)
    inv_depth = np.zeros(F, np.float32)
    for k in range(W + 1):
        Rk = Rsc.from_quat(np.roll(np.asarray(ws.Qs)[k], -1)).as_matrix()
        Xc = (Xw - np.asarray(ws.Ps)[k]) @ Rk  # body==cam frame
        z = Xc[:, 2]
        # use z-forward camera: here qic=I so cam frame == body; ensure depth
        obs[:, k] = Xc[:, :2] / np.maximum(z[:, None], 1e-6)
        obs_valid[:, k] = z > 0.5
        if k == 0:
            inv_depth = (1.0 / np.maximum(z, 1e-3)).astype(np.float32)

    table = fm.FeatureTable(
        ids=jnp.arange(F, dtype=jnp.int32),
        start_frame=jnp.zeros(F, jnp.int32),
        obs=jnp.array(obs), vel=jnp.zeros((F, W + 1, 2)),
        obs_valid=jnp.array(obs_valid),
        inv_depth=jnp.array(inv_depth),
        lidar_flag=jnp.zeros(F, bool),
        rt=jnp.zeros((F, W + 1)),
    )
    G = jnp.array([0.0, 0.0, params.g_norm])
    return caps, cfg, ws, pints, table, G


def test_marginal_matches_minimized_full_cost(rng):
    caps, cfg, ws, pints, table, G = build_consistent_window()
    W = cfg.window
    prior0 = ba.empty_prior(cfg)
    feat_valid = table.ids >= 0
    frame_valid = jnp.ones(W + 1, bool)
    td0 = jnp.zeros(())

    pr = ba.marginalize_old(
        ws, table.inv_depth, table.obs, table.vel, table.obs_valid,
        table.start_frame, feat_valid, table.lidar_flag, pints,
        frame_valid, prior0, G, td0, cfg,
    )

    # full included-factor cost as a function of (d_drop, d_keep)
    D = cfg.d_total

    def res_full(d):
        d_state = d[: cfg.d_state]
        d_depth = d[cfg.d_state:]
        ws2 = ba._retract_window(ws, d_state, cfg)
        inv2 = table.inv_depth + d_depth
        r_imu = ba.imu_residuals(ws2, pints, frame_valid, G, cfg)[0]
        r_proj, _ = ba.projection_residuals(
            ws2, inv2, table.obs, table.vel, table.obs_valid,
            table.start_frame, feat_valid, td0, cfg,
        )
        return jnp.concatenate([r_imu, r_proj.reshape(-1)])

    J = np.asarray(jax.jacfwd(res_full)(jnp.zeros(D))).astype(np.float64)
    r0 = np.asarray(res_full(jnp.zeros(D))).astype(np.float64)

    # perturb kept states, compare prior cost vs minimized full cost
    kept_idx = np.arange(15, cfg.d_state)
    drop_idx = np.concatenate([np.arange(15), cfg.d_state + np.arange(cfg.max_features)])
    eps_reg = 1e-3
    for trial in range(3):
        d_keep = rng.normal(size=len(kept_idx)) * 0.01
        # full cost minimized over dropped vars (f64), with the same eps reg
        Jd = J[:, drop_idx]
        Jk = J[:, kept_idx]
        rhs = r0 + Jk @ d_keep
        A = np.concatenate([Jd, eps_reg * np.eye(len(drop_idx))], axis=0)
        b = np.concatenate([rhs, np.zeros(len(drop_idx))])
        dd, *_ = np.linalg.lstsq(A, -b, rcond=None)
        min_cost = float(np.sum((rhs + Jd @ dd) ** 2) + eps_reg**2 * np.sum(dd**2))

        # prior cost at the same kept perturbation: build retracted ws
        d_state = np.zeros(cfg.d_state, np.float32)
        d_state[15:] = d_keep
        ws2 = ba._retract_window(ws, jnp.array(d_state), cfg)
        # prior lives in the post-slide layout: shift frames left
        roll = lambda x: jnp.concatenate([x[1:], x[-1:]], axis=0)
        ws2s = ws2._replace(Ps=roll(ws2.Ps), Qs=roll(ws2.Qs), Vs=roll(ws2.Vs),
                            Bas=roll(ws2.Bas), Bgs=roll(ws2.Bgs))
        rp = np.asarray(pr.r + pr.J @ ba.state_minus(ws2s, pr.ws_bar, cfg))
        prior_cost = float(np.sum(rp**2))
        assert abs(prior_cost - min_cost) < 0.05 * max(min_cost, 1e-3) + 1e-4, (
            trial, prior_cost, min_cost
        )


def test_solver_parity_cholesky_vs_qr():
    """The damped-normal-equation path must reproduce the augmented-QR LM
    step (same damping: lam*diag(col^2)) on a consistent window."""
    import dataclasses

    caps, cfg, ws, pints, table, G = build_consistent_window(W=6, F=64, seed=3)
    feat_valid = table.ids >= 0
    fv = jnp.ones(cfg.window + 1, bool)
    prior = ba.empty_prior(cfg)
    # perturb so the solvers have real work to do
    ws_p = ws._replace(Ps=ws.Ps + 0.03, Vs=ws.Vs + 0.05)

    outs = {}
    for solver in ("qr", "cholesky", "schur"):
        cfg_s = dataclasses.replace(cfg, solver=solver, iterations=5)
        res = ba.solve(
            ws_p, table.inv_depth, table.obs, table.vel, table.obs_valid,
            table.start_frame, feat_valid, table.lidar_flag, pints, fv,
            prior, G, jnp.float32(0.0), cfg_s,
        )
        outs[solver] = res
    np.testing.assert_allclose(
        np.asarray(outs["cholesky"].ws.Ps), np.asarray(outs["qr"].ws.Ps),
        atol=2e-3,
    )
    assert float(outs["cholesky"].final_cost) < float(outs["qr"].final_cost) * 1.2
    # the depth-eliminated (DENSE_SCHUR) path is algebraically the same
    # damped normal-equation step — identical damping of the state block,
    # Marquardt (column-norm²) damping of the diagonal depth block
    np.testing.assert_allclose(
        np.asarray(outs["schur"].ws.Ps), np.asarray(outs["qr"].ws.Ps),
        atol=2e-3,
    )
    assert float(outs["schur"].final_cost) < float(outs["qr"].final_cost) * 1.2
