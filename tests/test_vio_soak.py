"""Long-duration VIO soak (VERDICT weak-6): hundreds of slide-window
cycles over the fixed-capacity feature table — where FEJ/prior/shift
bookkeeping bugs actually surface. Asserts sustained health, bounded
drift, finite state, and table invariants at the end."""

import os
import subprocess
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as Rsc

from lvislam_tpu.models.vio import estimator as est
from lvislam_tpu.models.vio import feature_manager as fm
from lvislam_tpu.ops import ba
from lvislam_tpu.utils import synthetic as syn


@pytest.mark.slow
def test_vio_soak_300_frames(request):
    # Inside a full-suite process, run in a FRESH interpreter: XLA:CPU
    # segfaults inside backend_compile_and_load after hundreds of
    # accumulated compiles in one process (observed 3x, always here, never
    # standalone — see NOTES.md). The child is this same test, solo.
    if (os.environ.get("_LVI_ISOLATED") != "1"
            and len(request.session.items) > 10):
        r = subprocess.run(
            [sys.executable, "-m", "pytest", os.path.abspath(__file__),
             "-q", "-p", "no:cacheprovider"],
            env={**os.environ, "_LVI_ISOLATED": "1"},
            capture_output=True, text=True, timeout=1800,
        )
        assert r.returncode == 0, (r.stdout[-3000:] + r.stderr[-1000:])
        return
    _soak_300_frames()


def _soak_300_frames():
    CAPS = fm.VioCaps(window=8, max_features=96, imu_buf=32, frame_features=64)
    PARAMS = est.VioParams(g_norm=syn.GRAVITY, use_visual_init=False)
    CFG = ba.BAConfig(window=8, max_features=96, iterations=3,
                      estimate_td=False, estimate_extrinsic=False,
                      solver="cholesky")
    world = syn.default_world(seed=2)
    traj = syn.figure8_trajectory(scale=3.0, period=30.0)
    X = syn.landmark_points(world, n=400, seed=7)
    # camera x-right / y-down / z-forward mounted on the x-forward body
    R_BC = np.array([[0.0, 0.0, 1.0], [-1.0, 0.0, 0.0], [0.0, -1.0, 0.0]]).T
    rate, imu_rate = 10.0, 200.0
    N, M, W1 = CAPS.frame_features, CAPS.imu_buf, CAPS.window + 1
    n_frames = 300

    state = est.vio_init(CAPS, PARAMS)
    qic = np.roll(Rsc.from_matrix(R_BC).as_quat(), 1).astype(np.float32)
    state = state._replace(ws=state.ws._replace(qic=jnp.array(qic)))

    def frame_obs(k):
        t = k / rate
        p, R = traj.pose(np.array([t]))
        p, R = p[0], R[0]
        Xc = (X - p) @ R @ R_BC
        z = Xc[:, 2]
        norm = Xc[:, :2] / np.maximum(z[:, None], 1e-6)
        # pixel-ish observation noise
        rng = np.random.default_rng(k)
        norm = norm + rng.normal(0, 0.5 / 460.0, norm.shape)
        ok = (z > 1.0) & (np.abs(norm) < 0.7).all(axis=1)
        ids = np.full(N, -1, np.int32)
        nm = np.zeros((N, 2), np.float32)
        sel = np.nonzero(ok)[0][:N]
        ids[: len(sel)] = sel
        nm[: len(sel)] = norm[sel]
        return t, ids, nm, p

    def lidar_seed(k_end):
        Ps, Qs, Vs = [], [], []
        for kk in range(k_end - CAPS.window, k_end + 1):
            t = kk / rate
            p, R = traj.pose(np.array([t]))
            Ps.append(p[0])
            Qs.append(np.roll(Rsc.from_matrix(R[0]).as_quat(), 1))
            v = (traj.pose(np.array([t + 1e-4]))[0][0]
                 - traj.pose(np.array([t - 1e-4]))[0][0]) / 2e-4
            Vs.append(v)
        return dict(available=jnp.array(True),
                    Ps=jnp.array(np.stack(Ps), jnp.float32),
                    Qs=jnp.array(np.stack(Qs), jnp.float32),
                    Vs=jnp.array(np.stack(Vs), jnp.float32),
                    ba=jnp.zeros(3), bg=jnp.zeros(3))

    no_seed = dict(
        available=jnp.array(False), Ps=jnp.zeros((W1, 3)),
        Qs=jnp.tile(jnp.array([1.0, 0, 0, 0]), (W1, 1)),
        Vs=jnp.zeros((W1, 3)), ba=jnp.zeros(3), bg=jnp.zeros(3),
    )

    errs = []
    for k in range(n_frames):
        if k > 0:
            n = int(imu_rate / rate)
            ts = (np.arange(n) + 1) / imu_rate + (k - 1) / rate
            w, f = traj.imu(ts)
            dts = np.zeros(M, np.float32); dts[:n] = 1.0 / imu_rate
            accs = np.zeros((M, 3), np.float32); accs[:n] = f; accs[n:] = f[-1]
            gyrs = np.zeros((M, 3), np.float32); gyrs[:n] = w; gyrs[n:] = w[-1]
            state = est.process_imu(state, jnp.array(dts), jnp.array(accs),
                                    jnp.array(gyrs), CAPS, PARAMS)
        t, ids, nm, p_true = frame_obs(k)
        seed = lidar_seed(k) if k == CAPS.window else no_seed
        state, out = est.process_image(
            state, jnp.array(ids), jnp.array(nm),
            jnp.zeros((N, 2), jnp.float32), jnp.full(N, -1.0, jnp.float32),
            jnp.array(ids >= 0), seed, CAPS, PARAMS, CFG,
        )
        if k > CAPS.window + 2:
            errs.append(np.linalg.norm(np.asarray(out["pos"]) - p_true))

    # sustained health: no reboots after init, bounded drift, finite state
    assert bool(state.initialized), "VIO lost initialization during soak"
    assert int(state.failure_count) == 0, "failure reboot(s) during soak"
    errs = np.array(errs)
    assert np.isfinite(errs).all()
    assert np.median(errs[-50:]) < 1.0, (
        f"drift after 300 frames: {np.median(errs[-50:]):.3f} m"
    )
    for leaf in jax.tree.leaves(state):
        assert np.isfinite(np.asarray(leaf, np.float64)).all()

    # feature-table invariants after ~290 slides
    tab = state.table
    ids_np = np.asarray(tab.ids)
    live = ids_np >= 0
    assert live.sum() > 16
    vals, counts = np.unique(ids_np[live], return_counts=True)
    assert (counts == 1).all(), "duplicate feature ids in the table"
    sf = np.asarray(tab.start_frame)
    ov = np.asarray(tab.obs_valid)
    assert (sf[live] >= 0).all() and (sf[live] <= CAPS.window).all()
    # no observation may precede its feature's start frame
    cols = np.arange(CAPS.window + 1)[None, :]
    assert not (ov[live] & (cols < sf[live][:, None])).any()
