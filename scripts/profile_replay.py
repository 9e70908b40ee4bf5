#!/usr/bin/env python
"""Profile the batched fused LVI replay (`models/replay.py`) on the live
backend: per-branch device time (scan / frame / noop rows), upload and
readback RPC costs, and the end-to-end wall per batch — the numbers that
decide where the measured config-5 RTF goes next.

Usage: python scripts/profile_replay.py [reps]
"""
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import numpy as np
import jax
import jax.numpy as jnp


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    from scipy.spatial.transform import Rotation as Rsc
    from test_lvi_system import make_system
    from lvislam_tpu.utils import synthetic as syn
    from lvislam_tpu.models import replay as rp

    import dataclasses as dc

    on_tpu = jax.default_backend() != "cpu"
    sys_ = make_system(pallas=on_tpu)
    sys_.cfg.replay_batch = 16
    sys_.cfg.mapping_process_interval = 0.15  # bench operating point
    sys_.cfg.ba = dc.replace(sys_.cfg.ba, solver="schur")
    sys_.cfg.lio.params = dc.replace(
        sys_.cfg.lio.params, nnRefreshEvery=2, mapRebuildEvery=8,
        gatherOncePerScan=on_tpu)
    world = syn.default_world(seed=0)
    traj = syn.figure8_trajectory(scale=3.0, period=30.0)
    d = 4.0

    imu_ts = (np.arange(int(d * 200)) + 1) / 200
    w_all, f_all = traj.imu(imu_ts)
    for i, t in enumerate(imu_ts):
        _, R = traj.pose(np.array([t]))
        rpy = Rsc.from_matrix(R[0]).as_euler("ZYX")[::-1]
        sys_.feed_imu(t, w_all[i], f_all[i], rpy=np.array(rpy, np.float32))
    scans = [(0.05 + i / 10, syn.simulate_lidar_scan(
        world, traj, 0.05 + i / 10, n_scan=4, horizon=900, sweep_time=0.1))
        for i in range(int(d * 10) - 1)]
    imgs = [(0.1 + i / 10, syn.render_camera_image(
        world, traj, 0.1 + i / 10, width=320, height=240, f=200.0))
        for i in range(int(d * 10) - 1)]
    for t, s in scans:
        sys_.feed_lidar(t, s)
    for t, im in imgs:
        sys_.feed_image(t, im)
    t0 = time.perf_counter()
    sys_.run()
    print(f"warm run: {time.perf_counter() - t0:.1f}s replay_active="
          f"{sys_._replay_active} vio_init={sys_._vio_initialized}",
          flush=True)
    assert sys_._replay_active, "replay never activated"

    st = sys_._replay_statics
    carry = sys_._carry

    # representative staged rows harvested from a live batch: re-stage one
    # scan + one frame through the normal path
    t_s, s_s = scans[-1]
    sys_._ev_rows, sys_._ev_meta = [], []
    sys_._stage_scan(t_s + 0.1, s_s)
    scan_row = sys_._ev_rows[-1]
    sys_._stage_frame(t_s + 0.15, dict(image=imgs[-1][1]))
    frame_row = sys_._ev_rows[-1]
    noop_row = rp.pack_noop_event(st)
    K = sys_.cfg.replay_batch

    def batch(row):
        return jnp.asarray(np.stack([row] * K))

    def sync(c):
        np.asarray(jax.tree_util.tree_leaves(c.vins)[0][:1])

    def time_batch(name, rows_np):
        rows = jnp.asarray(rows_np)
        c, outs = rp.replay_batch_step(carry, rows, st)  # compile
        sync(c)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            c, outs = rp.replay_batch_step(carry, rows, st)
            sync(c)
            ts.append(time.perf_counter() - t0)
        best = min(ts)
        print(f"{name:28s} best {best*1e3:8.2f} ms/batch  "
              f"{best*1e3/K:6.2f} ms/event  (all {[f'{x*1e3:.1f}' for x in ts]})",
              flush=True)
        return best

    t_noop = time_batch("all-noop (scan overhead)", np.stack([noop_row] * K))
    t_scan = time_batch("all-scan", np.stack([scan_row] * K))
    t_frame = time_batch("all-frame", np.stack([frame_row] * K))
    mixed = np.stack([scan_row if i % 2 == 0 else frame_row for i in range(K)])
    t_mix = time_batch("mixed scan/frame", mixed)

    # ---- branch decomposition via statics variants (each is its own
    # compile of the full event program; whole-batch deltas only — the
    # device timer floor makes isolated sub-op numbers meaningless) ----
    frames = np.stack([frame_row] * K)
    scans_np = np.stack([scan_row] * K)

    def time_variant(name, st_v, rows_np=frames):
        rows = jnp.asarray(rows_np)
        c, _ = rp.replay_batch_step(carry, rows, st_v)
        sync(c)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            c, _ = rp.replay_batch_step(carry, rows, st_v)
            sync(c)
            ts.append(time.perf_counter() - t0)
        print(f"{name:28s} best {min(ts)*1e3:8.2f} ms/batch  "
              f"{min(ts)*1e3/K:6.2f} ms/event", flush=True)

    time_variant("frame: no depth reg", dc.replace(st, use_depth=False))
    time_variant("frame: ba iterations=1",
                 dc.replace(st, ba_cfg=dc.replace(st.ba_cfg, iterations=1)))
    time_variant("frame: ba iterations=8",
                 dc.replace(st, ba_cfg=dc.replace(st.ba_cfg, iterations=8)))
    time_variant("frame: qr solver",
                 dc.replace(st, ba_cfg=dc.replace(st.ba_cfg, solver="qr")))
    time_variant(
        "frame: klt_iters=8",
        dc.replace(st, tracker=dc.replace(st.tracker, klt_iters=8)))

    # scan-branch decomposition: raising the min-valid-feature gates makes
    # `map_step` take its too-few-features path, skipping the whole GN
    # solve — the delta vs all-scan is the scan-to-map share; the other
    # two localize correspondence-refresh and map-rebuild cost
    time_variant(
        "scan: no GN (minValid gate)",
        dc.replace(st, lio_params=dc.replace(
            st.lio_params, edgeFeatureMinValidNum=10**6,
            surfFeatureMinValidNum=10**6)),
        scans_np)
    time_variant(
        "scan: nnRefreshEvery=4",
        dc.replace(st, lio_params=dc.replace(st.lio_params, nnRefreshEvery=4)),
        scans_np)
    time_variant(
        "scan: mapRebuildEvery=32",
        dc.replace(st, lio_params=dc.replace(st.lio_params, mapRebuildEvery=32)),
        scans_np)
    # do_depth lives in the row header (f32[1] = int16[2:4]), not statics
    scan_nodepth = scan_row.copy()
    scan_nodepth[2:4] = 0
    time_variant("scan: no depth accumulate", st,
                 np.stack([scan_nodepth] * K))

    # transfer costs
    rows = np.stack([scan_row if i % 2 == 0 else frame_row for i in range(K)])
    up = []
    for _ in range(reps):
        t0 = time.perf_counter()
        a = jnp.asarray(rows)
        np.asarray(a[0, :1])
        up.append(time.perf_counter() - t0)
    print(f"{'upload (batch, committed)':28s} best {min(up)*1e3:8.2f} ms  "
          f"rows {rows.nbytes/1e6:.2f} MB", flush=True)
    c, outs = rp.replay_batch_step(carry, jnp.asarray(rows), st)
    sync(c)
    rb = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(outs)
        rb.append(time.perf_counter() - t0)
    print(f"{'readback outs (done)':28s} best {min(rb)*1e3:8.2f} ms  "
          f"outs {np.asarray(outs).nbytes/1e3:.1f} KB", flush=True)

    per_cycle = (t_scan + t_frame) / K
    print(f"\nper-100ms-cycle device time ~ {per_cycle*1e3:.2f} ms "
          f"-> compute-only RTF bound {100.0/ (per_cycle*1e3):.1f}x",
          flush=True)


if __name__ == "__main__":
    main()
