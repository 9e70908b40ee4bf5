import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_default_device", jax.devices("cpu")[0])
import test_vio_estimator as T
from scipy.spatial.transform import Rotation as Rsc

est, fm, ba = T.est, T.fm, T.ba
CAPS, PARAMS, CFG, R_BC = T.CAPS, T.PARAMS, T.CFG, T.R_BC
frames, traj, X = T.make_frames(n_frames=32)
state = est.vio_init(CAPS, PARAMS)
qic = np.roll(Rsc.from_matrix(R_BC).as_quat(), 1).astype(np.float32)
state = state._replace(ws=state.ws._replace(qic=jnp.array(qic)))
N, M, W1 = CAPS.frame_features, CAPS.imu_buf, CAPS.window + 1
imu_rate, rate = 200.0, 10.0
for k, fr in enumerate(frames):
    if k > 0:
        i0 = int(round(frames[k - 1]["t"] * imu_rate)); i1 = int(round(fr["t"] * imu_rate))
        ts = (np.arange(i0, i1) + 1) / imu_rate
        w, f = traj.imu(ts)
        dts = np.zeros(M, np.float32); accs = np.zeros((M, 3), np.float32); gyrs = np.zeros((M, 3), np.float32)
        n = len(ts); dts[:n] = 1.0 / imu_rate; accs[:n] = f; gyrs[:n] = w
        if n < M:
            accs[n:] = accs[n - 1]; gyrs[n:] = gyrs[n - 1]
        state = est.process_imu(state, jnp.array(dts), jnp.array(accs), jnp.array(gyrs), CAPS, PARAMS)
    ids = np.full(N, -1, np.int32); norm = np.zeros((N, 2), np.float32); vel = np.zeros((N, 2), np.float32)
    depth = np.full(N, -1.0, np.float32)
    sel = np.nonzero(fr["ok"])[0][:N]
    ids[: len(sel)] = sel; norm[: len(sel)] = fr["norm"][sel]
    if k > 0:
        prev = frames[k - 1]; both = prev["ok"][sel]
        vel[: len(sel)][both] = (fr["norm"][sel][both] - prev["norm"][sel][both]) * rate
    valid = ids >= 0
    if k == CAPS.window:
        Ps, Qs, Vs = [], [], []
        for kk in range(W1):
            t = frames[kk]["t"]; p, R = traj.pose(np.array([t]))
            Ps.append(p[0]); Qs.append(np.roll(Rsc.from_matrix(R[0]).as_quat(), 1))
            Vs.append((traj.pose(np.array([t + 1e-4]))[0][0] - traj.pose(np.array([t - 1e-4]))[0][0]) / 2e-4)
        lidar_odom = dict(available=jnp.array(True), Ps=jnp.array(np.stack(Ps), jnp.float32),
                          Qs=jnp.array(np.stack(Qs), jnp.float32), Vs=jnp.array(np.stack(Vs), jnp.float32),
                          ba=jnp.zeros(3), bg=jnp.zeros(3))
    else:
        lidar_odom = dict(available=jnp.array(False), Ps=jnp.zeros((W1, 3)),
                          Qs=jnp.tile(jnp.array([1.0, 0, 0, 0]), (W1, 1)), Vs=jnp.zeros((W1, 3)),
                          ba=jnp.zeros(3), bg=jnp.zeros(3))
    if k == -17:
        # introspect residuals at the pre-solve state
        tab2 = fm.triangulate_all(state.table, state.ws.Ps, state.ws.Qs, state.ws.tic, state.ws.qic, CAPS)
        G = jnp.array([0.,0.,PARAMS.g_norm])
        r_imu = ba.imu_residuals(state.ws, state.pints, state.frame_valid, G, CFG)
        print("  k17 imu norms:", np.linalg.norm(np.asarray(r_imu),axis=1).round(2))
        print("  k17 pints sum_dt:", [round(float(state.pints.sum_dt[i]),3) for i in range(10)])
        r_proj, m = ba.projection_residuals(state.ws, tab2.inv_depth, tab2.obs, tab2.vel,
            tab2.obs_valid, tab2.start_frame, tab2.ids>=0, state.td0, CFG)
        print("  k17 proj max", float(jnp.abs(r_proj).max()), "n", int(m.sum()))
        pr = state.prior
        rp = pr.r + pr.J @ ba.state_minus(state.ws, pr.ws_bar, CFG)
        print("  k17 prior |r|", float(jnp.linalg.norm(rp)))
    Ps_pre = np.asarray(state.ws.Ps).copy()
    state, out = est.process_image(state, jnp.array(ids), jnp.array(norm), jnp.array(vel),
                                   jnp.array(depth), jnp.array(valid), lidar_odom, CAPS, PARAMS, CFG)
    if k >= 11:
        # post-slide Ps: frame j of new = j+1 of old when kf else same
        moved = np.linalg.norm(np.asarray(state.ws.Ps)[4] - (Ps_pre[5] if bool(out['is_keyframe']) else Ps_pre[4]))
        pr = state.prior
        rp = float(jnp.linalg.norm(pr.r))
        print(f"   mid-frame move={moved:.3f} |prior r|={rp:.3f}")
    p_est = np.asarray(out["pos"])
    j = int(min(int(state.frame_count), 10))
    tab=state.table
    nnew = int(((np.asarray(tab.start_frame)>=9)&(np.asarray(tab.ids)>=0)).sum())
    nfree = int((np.asarray(tab.ids)<0).sum())
    print(f"k={k} init={bool(out['initialized'])} kf={bool(out['is_keyframe'])} fail={bool(out['failed'])} "
          f"nnew={nnew} nfree={nfree} "
          f"perr={np.linalg.norm(p_est - fr['pos']):.3f} "
          f"Ba={np.linalg.norm(np.asarray(state.ws.Bas[j])):.3f} "
          f"V={np.linalg.norm(np.asarray(state.ws.Vs[j])):.2f} "
          f"ninv={(np.asarray(state.table.inv_depth) > 0).sum()}")
