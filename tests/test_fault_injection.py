"""Fault injection + recovery (SURVEY.md §5): seeded sensor dropout through
the bus; the pipeline must survive missing lidar scans, and the tracker
restart protocol must fire on camera stream gaps."""

import numpy as np
import jax.numpy as jnp

from lvislam_tpu.utils.bus import Bus


def test_bus_dropout_deterministic():
    for _ in range(2):
        bus = Bus()
        got = []
        bus.subscribe("a", lambda t, m: got.append(m))
        bus.set_dropout("a", 0.5, seed=7)
        for i in range(100):
            bus.publish("a", float(i), i)
        bus.run()
        if _ == 0:
            first = list(got)
    assert got == first  # bit-identical across replays
    assert 20 < len(got) < 80


def test_vio_runner_restart_on_gap():
    from scipy.spatial.transform import Rotation as Rsc
    from lvislam_tpu.core.config import CameraIntrinsics
    from lvislam_tpu.models.vio.pipeline import VioRunner, VioRunnerConfig
    from lvislam_tpu.models.vio import feature_tracker as ft, feature_manager as fm
    from lvislam_tpu.models.vio import estimator as est
    from lvislam_tpu.ops import ba
    from lvislam_tpu.utils import synthetic as syn

    cam = CameraIntrinsics(model_type="PINHOLE", gamma1=200.0, gamma2=200.0,
                           u0=160.0, v0=120.0, k1=0, k2=0, p1=0, p2=0)
    cfg = VioRunnerConfig(
        camera=cam,
        tracker=ft.TrackerParams(max_cnt=32, min_dist=20, klt_levels=1,
                                 klt_half=5, klt_iters=8, equalize=False),
        caps=fm.VioCaps(window=4, max_features=48, imu_buf=16, frame_features=32),
        params=est.VioParams(g_norm=syn.GRAVITY, use_visual_init=False),
        ba=ba.BAConfig(window=4, max_features=48, iterations=2,
                       estimate_td=False, estimate_extrinsic=False),
        image_height=240, image_width=320, max_stream_gap=0.5,
    )
    runner = VioRunner(cfg)
    world = syn.default_world(seed=3)
    traj = syn.figure8_trajectory(scale=3.0, period=30.0)
    img = syn.render_camera_image(world, traj, 0.0, width=320, height=240, f=200.0)
    runner.feed_image(0.1, img)
    runner.feed_image(0.2, img)
    fc0 = int(runner.vio.failure_count)
    # 2-second stream gap: restart protocol must flush and bump the count
    runner.feed_image(2.3, img)
    assert int(runner.vio.failure_count) == fc0 + 1
    assert int(runner.vio.frame_count) <= 1


def test_vio_jump_failure_reboots_and_reinits():
    """Divergence protocol (`estimator.cpp:648-693,188-196`): an IMU spike
    blows the propagated state -> failure detection fires -> clearState
    reboot -> the window re-initializes from the lidar seed; the bumped
    failure_count (the LIS reset-id, exchange 5) invalidates stale guesses."""
    from scipy.spatial.transform import Rotation as Rsc
    from lvislam_tpu.models.vio import estimator as est
    from lvislam_tpu.models.vio import feature_manager as fm
    from lvislam_tpu.ops import ba
    from lvislam_tpu.utils import synthetic as syn

    CAPS = fm.VioCaps(window=6, max_features=64, imu_buf=32, frame_features=48)
    PARAMS = est.VioParams(g_norm=syn.GRAVITY, use_visual_init=False)
    CFG = ba.BAConfig(window=6, max_features=64, iterations=3,
                      estimate_td=False, estimate_extrinsic=False)
    R_BC = np.array([[0.0, 0.0, 1.0], [-1.0, 0.0, 0.0], [0.0, -1.0, 0.0]]).T

    world = syn.default_world(seed=1)
    traj = syn.figure8_trajectory(scale=3.0, period=30.0)
    X = syn.landmark_points(world, n=120, seed=2)
    rate, imu_rate = 10.0, 200.0
    N, M, W1 = CAPS.frame_features, CAPS.imu_buf, CAPS.window + 1

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

    def step(state, k, spike=False, seed_at=None):
        if k > 0:
            n = int(imu_rate / rate)
            ts = (np.arange(n) + 1) / imu_rate + (k - 1) / rate
            w, f = traj.imu(ts)
            if spike:
                f = f + 400.0  # broken accelerometer burst
            dts = np.zeros(M, np.float32); dts[:n] = 1.0 / imu_rate
            accs = np.zeros((M, 3), np.float32); accs[:n] = f; accs[n:] = f[-1]
            gyrs = np.zeros((M, 3), np.float32); gyrs[:n] = w; gyrs[n:] = w[-1]
            state = est.process_imu(state, jnp.array(dts), jnp.array(accs),
                                    jnp.array(gyrs), CAPS, PARAMS)
        t, ids, nm, p = frame_obs(k)
        seed = lidar_seed(k) if seed_at is not None and k == seed_at else no_seed
        state, out = est.process_image(
            state, jnp.array(ids), jnp.array(nm),
            jnp.zeros((N, 2), jnp.float32), jnp.full(N, -1.0, jnp.float32),
            jnp.array(ids >= 0), seed, CAPS, PARAMS, CFG,
        )
        return state, out

    # init phase
    for k in range(CAPS.window + 2):
        state, out = step(state, k, seed_at=CAPS.window)
    assert bool(state.initialized)
    fc0 = int(state.failure_count)

    # inject the spike: propagation jumps >> jump_t
    state, out = step(state, CAPS.window + 2, spike=True)
    assert bool(out["failed"]), "spike did not trigger failure detection"
    assert int(state.failure_count) == fc0 + 1  # reset-id bumped (exchange 5)
    assert not bool(state.initialized)  # clearState reboot
    assert int(state.frame_count) == 0

    # recovery: feed clean frames again; window refills and re-initializes
    k0 = CAPS.window + 3
    for k in range(k0, k0 + CAPS.window + 2):
        state, out = step(state, k, seed_at=k0 + CAPS.window)
    assert bool(state.initialized), "VIO did not re-initialize after reboot"
    assert int(state.failure_count) == fc0 + 1  # no further failures
