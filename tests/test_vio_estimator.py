"""VIO estimator integration test (BASELINE config 4 core): synthetic
feature tracks + IMU through the full window pipeline — lidar-seeded init,
triangulation, BA, marginalization, sliding — must track the trajectory."""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as Rsc

from lvislam_tpu.core import lie
from lvislam_tpu.models.vio import estimator as est
from lvislam_tpu.models.vio import feature_manager as fm
from lvislam_tpu.ops import ba
from lvislam_tpu.utils import synthetic as syn

CAPS = fm.VioCaps(window=10, max_features=128, imu_buf=32, frame_features=64)
PARAMS = est.VioParams(g_norm=syn.GRAVITY)
CFG = ba.BAConfig(window=10, max_features=128, iterations=5,
                  estimate_td=False, estimate_extrinsic=False)

R_BC = np.array([[0.0, 0.0, 1.0], [-1.0, 0.0, 0.0], [0.0, -1.0, 0.0]]).T
# body <- camera: cam z -> body x, cam x -> body -y, cam y -> body -z


def make_frames(n_frames=20, rate=10.0, n_land=200, seed=0, life=15):
    rng = np.random.default_rng(seed)
    world = syn.default_world(seed=1)
    traj = syn.figure8_trajectory(scale=3.0, period=30.0)
    X = syn.landmark_points(world, n=n_land, seed=2)
    frames = []
    for k in range(n_frames):
        t = k / rate
        p, R = traj.pose(np.array([t]))
        p, R = p[0], R[0]
        Xc = (X - p) @ R @ R_BC  # world -> body -> camera
        z = Xc[:, 2]
        norm = Xc[:, :2] / np.maximum(z[:, None], 1e-6)
        ok = (z > 1.0) & (np.abs(norm) < 0.7).all(axis=1)
        # realistic track churn: each landmark is trackable only in its own
        # ~1.5 s visibility window (otherwise the same features get
        # re-marginalized forever — adversarial for any FEJ prior, incl the
        # reference's)
        phase = np.arange(len(X)) % (2 * life)
        ok &= ((k + phase) % (2 * life)) < life
        frames.append(dict(t=t, norm=norm, ok=ok, pos=p, R=R, depth_true=z))
    return frames, traj, X


def test_vio_tracks():
    frames, traj, X = make_frames()
    state = est.vio_init(CAPS, PARAMS)
    # set extrinsic
    qic = np.roll(Rsc.from_matrix(R_BC).as_quat(), 1).astype(np.float32)
    state = state._replace(ws=state.ws._replace(qic=jnp.array(qic)))

    imu_rate, rate = 200.0, 10.0
    N = CAPS.frame_features
    M = CAPS.imu_buf
    errs = []
    for k, fr in enumerate(frames):
        if k > 0:
            # integer sample indexing: float arange can produce an extra
            # boundary sample (corrupting sum_dt by one period)
            i0 = int(round(frames[k - 1]["t"] * imu_rate))
            i1 = int(round(fr["t"] * imu_rate))
            ts = (np.arange(i0, i1) + 1) / imu_rate
            w, f = traj.imu(ts)
            dts = np.zeros(M, np.float32)
            accs = np.zeros((M, 3), np.float32)
            gyrs = np.zeros((M, 3), np.float32)
            n = len(ts)
            dts[:n] = 1.0 / imu_rate
            accs[:n] = f
            gyrs[:n] = w
            if n < M:
                accs[n:] = accs[n - 1]
                gyrs[n:] = gyrs[n - 1]
            state = est.process_imu(state, jnp.array(dts), jnp.array(accs),
                                    jnp.array(gyrs), CAPS, PARAMS)

        ids = np.full(N, -1, np.int32)
        norm = np.zeros((N, 2), np.float32)
        vel = np.zeros((N, 2), np.float32)
        depth = np.full(N, -1.0, np.float32)
        sel = np.nonzero(fr["ok"])[0][:N]
        ids[: len(sel)] = sel
        norm[: len(sel)] = fr["norm"][sel]
        if k > 0:
            prev = frames[k - 1]
            both = prev["ok"][sel]
            vel[: len(sel)][both] = (
                (fr["norm"][sel][both] - prev["norm"][sel][both]) * rate
            )
        valid = ids >= 0

        # lidar-odometry seed: ground-truth window poses at init time
        W1 = CAPS.window + 1
        if k == CAPS.window:
            Ps, Qs, Vs = [], [], []
            for kk in range(W1):
                t = frames[kk]["t"]
                p, R = traj.pose(np.array([t]))
                Ps.append(p[0])
                Qs.append(np.roll(Rsc.from_matrix(R[0]).as_quat(), 1))
                v = (traj.pose(np.array([t + 1e-4]))[0][0] - traj.pose(np.array([t - 1e-4]))[0][0]) / 2e-4
                Vs.append(v)
            lidar_odom = dict(
                available=jnp.array(True),
                Ps=jnp.array(np.stack(Ps), jnp.float32),
                Qs=jnp.array(np.stack(Qs), jnp.float32),
                Vs=jnp.array(np.stack(Vs), jnp.float32),
                ba=jnp.zeros(3), bg=jnp.zeros(3),
            )
        else:
            lidar_odom = dict(
                available=jnp.array(False),
                Ps=jnp.zeros((W1, 3)), Qs=jnp.tile(jnp.array([1.0, 0, 0, 0]), (W1, 1)),
                Vs=jnp.zeros((W1, 3)), ba=jnp.zeros(3), bg=jnp.zeros(3),
            )

        state, out = est.process_image(
            state, jnp.array(ids), jnp.array(norm), jnp.array(vel),
            jnp.array(depth), jnp.array(valid), lidar_odom, CAPS, PARAMS, CFG,
        )
        if bool(out["initialized"]) and k > CAPS.window:
            p_est = np.asarray(out["pos"])
            errs.append(np.linalg.norm(p_est - fr["pos"]))
            assert not bool(out["failed"])

    assert len(errs) > 5
    errs = np.array(errs)
    assert errs.max() < 0.8, errs
    # depths should be close to truth for solved features
    inv = np.asarray(state.table.inv_depth)
    ids_t = np.asarray(state.table.ids)
    live = (ids_t >= 0) & (inv > 0)
    assert live.sum() > 20


def test_vio_visual_init():
    """Path B: no lidar seed at all — the estimator must bootstrap from
    visual SfM + IMU alignment (metric scale from the accelerometer)."""
    frames, traj, X = make_frames(n_frames=18, life=30)
    state = est.vio_init(CAPS, PARAMS)
    qic = np.roll(Rsc.from_matrix(R_BC).as_quat(), 1).astype(np.float32)
    state = state._replace(ws=state.ws._replace(qic=jnp.array(qic)))
    imu_rate, rate = 200.0, 10.0
    N, M, W1 = CAPS.frame_features, CAPS.imu_buf, CAPS.window + 1
    no_seed = dict(
        available=jnp.array(False), Ps=jnp.zeros((W1, 3)),
        Qs=jnp.tile(jnp.array([1.0, 0, 0, 0]), (W1, 1)),
        Vs=jnp.zeros((W1, 3)), ba=jnp.zeros(3), bg=jnp.zeros(3),
    )
    errs = []
    for k, fr in enumerate(frames):
        if k > 0:
            i0 = int(round(frames[k - 1]["t"] * imu_rate))
            i1 = int(round(fr["t"] * imu_rate))
            ts = (np.arange(i0, i1) + 1) / imu_rate
            w, f = traj.imu(ts)
            dts = np.zeros(M, np.float32); accs = np.zeros((M, 3), np.float32)
            gyrs = np.zeros((M, 3), np.float32)
            n = len(ts); dts[:n] = 1.0 / imu_rate; accs[:n] = f; gyrs[:n] = w
            if n < M:
                accs[n:] = accs[n - 1]; gyrs[n:] = gyrs[n - 1]
            state = est.process_imu(state, jnp.array(dts), jnp.array(accs),
                                    jnp.array(gyrs), CAPS, PARAMS)
        ids = np.full(N, -1, np.int32); norm = np.zeros((N, 2), np.float32)
        sel = np.nonzero(fr["ok"])[0][:N]
        ids[: len(sel)] = sel; norm[: len(sel)] = fr["norm"][sel]
        state, out = est.process_image(
            state, jnp.array(ids), jnp.array(norm), jnp.zeros((N, 2)),
            jnp.full(N, -1.0), jnp.array(ids >= 0), no_seed, CAPS, PARAMS, CFG,
        )
        if bool(out["initialized"]) and k > CAPS.window + 1:
            # compare RELATIVE motion (the visual-init world has its own
            # yaw/origin gauge): per-frame displacement magnitude
            p_est = np.asarray(out["pos"])
            errs.append((k, p_est))
    assert bool(state.initialized), "visual init did not trigger"
    assert len(errs) >= 3
    # metric scale: per-frame displacement should match ground truth (~0.105 m)
    d_est = [np.linalg.norm(errs[i + 1][1] - errs[i][1]) for i in range(len(errs) - 1)
             if errs[i + 1][0] == errs[i][0] + 1]
    gt_d = 0.105
    d_est = np.array(d_est)
    assert len(d_est) >= 2
    np.testing.assert_allclose(d_est.mean(), gt_d, rtol=0.25)
