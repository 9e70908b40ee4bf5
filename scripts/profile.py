#!/usr/bin/env python
"""One profiling entry point for the framework's hot paths (VERDICT r3 #9
consolidation of profile_stages / profile_replay / profile_transport /
profile_query_variants).

Subcommands:
  stages     per-stage device timing of the WARM LIO step at the bench
             operating point (MID360 4x6000) — where the device-resident
             floor goes: unpack, project, features, downsample, GN, map
             update (non-kf / incremental-kf / rebuild-kf).
  replay     the batched fused LVI replay (`models/replay.py`): per-branch
             device time (scan / frame / noop rows), statics-variant branch
             decomposition, upload/readback RPC costs, compute-only RTF
             bound.
  transport  host-side transport of batched LIO replay on the axon tunnel:
             pack_scan / upload / dispatch wall per scan vs device time.
  query      voxel-hash 27-cell gather + top-5 kernel variants (the
             scan-to-map hot op) — layout/dtype/dedup experiments that
             decide the Pallas kernel design.

Usage: python scripts/profile.py <stages|replay|transport|query> [args]
  replay takes an optional reps count (default 6).
Long runs on the live TPU: `nohup python scripts/profile.py stages > out &`.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import numpy as np


def _jax():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return jax


# ---------------------------------------------------------------- stages


def cmd_stages(args):
    jax = _jax()
    import jax.numpy as jnp

    from bench import _gen_scans, _make_cfg
    from lvislam_tpu.models.lio import frontend, mapping
    from lvislam_tpu.models.lio.pipeline import (
        LioPipeline, pack_scan, lio_full_step)
    from lvislam_tpu.ops import pointcloud as pc, scan2map
    from lvislam_tpu.utils import synthetic as syn

    on_tpu = jax.default_backend() != "cpu"
    cfg = _make_cfg(mapping, pallas=on_tpu)
    cfg.upload_batch = 1

    rate = 10.0
    world = syn.default_world(seed=0)
    traj = syn.figure8_trajectory(scale=3.0, period=40.0)
    scans = _gen_scans(13, rate, world, traj)

    pipe = LioPipeline(cfg)
    for s in scans[:12]:
        pipe.process_scan(s[0], s[1], s[2], s[3])
    np.asarray(pipe.state.x6)
    state = pipe.state
    print(f"warm state: kf_count={int(state.kf_count)}", flush=True)

    s = scans[12]
    buf = pack_scan(cfg, s[0], s[1], s[2], s[3])
    packed = jnp.asarray(buf)
    step_kw = dict(
        n_scan=cfg.n_scan, horizon=cfg.horizon, min_range=cfg.min_range,
        max_range=cfg.max_range, edge_threshold=cfg.edge_threshold,
        surf_threshold=cfg.surf_threshold, surf_leaf=cfg.odometry_surf_leaf,
        caps=cfg.caps, params=cfg.params,
        point_capacity=cfg.point_capacity, imu_capacity=cfg.imu_capacity,
        exact_selection=cfg.exact_loam_selection,
    )

    results = {}

    def timeit(name, body_fn, reps=32):
        """body_fn(c) -> scalar; chained `reps` times in one program."""
        def prog():
            def body(c, _):
                return body_fn(c), None
            return jax.lax.scan(body, jnp.float32(0), None, length=reps)[0]
        f = jax.jit(prog)
        out = f(); np.asarray(out).ravel()[:1]
        best = np.inf
        for _ in range(4):
            t0 = time.perf_counter()
            out = f(); np.asarray(out).ravel()[:1]
            best = min(best, time.perf_counter() - t0)
        per = best / reps * 1e3
        results[name] = round(per, 3)
        print(f"{name:44s} {per:8.3f} ms", flush=True)

    # ---- full fused step, non-keyframe stamp (same pose/time bucket) ----
    def f_full(c):
        st, out = lio_full_step(
            state, (packed + (c * 0).astype(jnp.int16)), **step_kw)
        return out.x6[0]

    timeit("lio_full_step FULL (non-kf)", f_full, reps=16)

    # ---- forced-keyframe stamp: stamp += 2.0 exceeds the livox 1.0 s gate
    buf_kf = buf.copy()
    misc = buf_kf[cfg.point_capacity * 6 + cfg.imu_capacity * 8:].view(np.float32)
    misc[5] = misc[5] + 2.0
    packed_kf = jnp.asarray(buf_kf)
    st_incr = state._replace(kf_since_rebuild=jnp.int32(0))
    st_full = state._replace(
        kf_since_rebuild=jnp.int32(cfg.params.mapRebuildEvery - 1))

    def f_full_kf_incr(c):
        st, out = lio_full_step(
            st_incr, (packed_kf + (c * 0).astype(jnp.int16)), **step_kw)
        return out.x6[0]

    timeit("lio_full_step FULL (kf, incremental)", f_full_kf_incr, reps=16)

    def f_full_kf_rebuild(c):
        st, out = lio_full_step(
            st_full, (packed_kf + (c * 0).astype(jnp.int16)), **step_kw)
        return out.x6[0]

    timeit("lio_full_step FULL (kf, full rebuild)", f_full_kf_rebuild, reps=16)

    # ---- stages in isolation ----
    P, M = cfg.point_capacity, cfg.imu_capacity
    xyz = np.zeros((P, 3), np.float32)
    inten = np.zeros(P, np.float32)
    ring = np.zeros(P, np.int32)
    rel_t = np.zeros(P, np.float32)
    pvalid = np.zeros(P, bool)
    n = min(len(s[0]["xyz"]), P)
    xyz[:n] = s[0]["xyz"][:n]; inten[:n] = s[0]["intensity"][:n]
    ring[:n] = s[0]["ring"][:n]; rel_t[:n] = s[0]["time"][:n]
    pvalid[:n] = True
    imu_t = np.zeros(M, np.float32); gyro = np.zeros((M, 3), np.float32)
    icount = min(len(s[1]), M)
    imu_t[:icount] = s[1][:icount]; gyro[:icount] = s[2][:icount]
    d = {k: jnp.asarray(v) for k, v in dict(
        xyz=xyz, inten=inten, ring=ring, rel_t=rel_t, pvalid=pvalid,
        imu_t=imu_t, gyro=gyro).items()}
    imu_count = jnp.int32(icount)
    rpy0 = jnp.asarray(s[3])

    def f_unpack(c):
        pk = packed + (c * 0).astype(jnp.int16)
        pts = pk[: P * 6].reshape(6, P)  # planar rows (matches pack_scan)
        x = pts[0:3].astype(jnp.float32).T * 0.003
        return x[0, 0]

    timeit("unpack (int16 -> f32)", f_unpack)

    def f_proj(c):
        p = frontend.project_scan(
            d["xyz"] + c * 1e-9, d["inten"], d["ring"], d["rel_t"],
            d["pvalid"], d["imu_t"], d["gyro"], imu_count, rpy0,
            jnp.array(True), n_scan=cfg.n_scan, horizon=cfg.horizon,
            min_range=cfg.min_range, max_range=cfg.max_range)
        return p.xyz[0, 0]

    timeit("project_scan", f_proj)

    proj = frontend.project_scan(
        d["xyz"], d["inten"], d["ring"], d["rel_t"], d["pvalid"],
        d["imu_t"], d["gyro"], imu_count, rpy0, jnp.array(True),
        n_scan=cfg.n_scan, horizon=cfg.horizon,
        min_range=cfg.min_range, max_range=cfg.max_range)

    def f_feat(c):
        f = frontend.extract_features(
            proj._replace(xyz=proj.xyz + c * 1e-9),
            edge_threshold=cfg.edge_threshold,
            surf_threshold=cfg.surf_threshold,
            surf_leaf=cfg.odometry_surf_leaf,
            max_corner=cfg.caps.scan_corner, max_surf=cfg.caps.scan_surf)
        return f.corner_xyz[0, 0]

    timeit("extract_features (incl surf-leaf ds)", f_feat)

    feats = frontend.extract_features(
        proj, edge_threshold=cfg.edge_threshold,
        surf_threshold=cfg.surf_threshold, surf_leaf=cfg.odometry_surf_leaf,
        max_corner=cfg.caps.scan_corner, max_surf=cfg.caps.scan_surf)

    def f_ds(c):
        cx, cv, _ = pc.voxel_downsample(
            feats.corner_xyz + c * 1e-9, feats.corner_valid,
            cfg.params.mappingCornerLeafSize, cfg.caps.scan_corner)
        sx, sv, _ = pc.voxel_downsample(
            feats.surf_xyz + c * 1e-9, feats.surf_valid,
            cfg.params.mappingSurfLeafSize, cfg.caps.scan_surf)
        return cx[0, 0] + sx[0, 0]

    timeit("voxel_downsample scan c+s", f_ds)

    c_xyz, c_val, _ = pc.voxel_downsample(
        feats.corner_xyz, feats.corner_valid,
        cfg.params.mappingCornerLeafSize, cfg.caps.scan_corner)
    s_xyz, s_val, _ = pc.voxel_downsample(
        feats.surf_xyz, feats.surf_valid,
        cfg.params.mappingSurfLeafSize, cfg.caps.scan_surf)

    def f_s2m(c):
        st = scan2map.scan_to_map_hashed(
            state.x6 + c * 1e-9, c_xyz, c_val, s_xyz, s_val,
            state.map_corner, state.map_surf,
            state.corner_hash, state.surf_hash,
            max_iters=20,
            eigen_thresh=cfg.params.degeneracyEigenThreshold,
            nn_refresh_every=cfg.params.nnRefreshEvery,
            use_pallas=cfg.caps.pallas_knn,
            gather_once=cfg.params.gatherOncePerScan and cfg.caps.pallas_knn)
        return st.x6[0]

    timeit("scan_to_map_hashed (operating point)", f_s2m)

    scan_info = dict(
        stamp=jnp.float32(s[0]["stamp"]),
        imu_available=jnp.array(True), imu_rpy_init=rpy0,
        odom_available=jnp.array(False), odom_trans=jnp.zeros(3),
        odom_quat=jnp.array([1.0, 0, 0, 0]),
        odom_reset_id=jnp.int32(0),
        gps_available=jnp.array(False), gps_pos=jnp.zeros(3),
        gps_noise=jnp.zeros(3), gps_use_elevation=jnp.array(False),
    )

    def f_map_nonkf(c):
        st, out = mapping.map_step(
            state._replace(x6=state.x6 + c * 1e-12), scan_info, feats,
            cfg.caps, cfg.params)
        return out.x6[0]

    timeit("map_step (non-kf)", f_map_nonkf, reps=16)

    scan_info_kf = dict(scan_info, stamp=scan_info["stamp"] + 2.0)

    def f_map_kf_incr(c):
        st, out = mapping.map_step(
            st_incr._replace(x6=st_incr.x6 + c * 1e-12), scan_info_kf,
            feats, cfg.caps, cfg.params)
        return out.x6[0]

    timeit("map_step (kf, incremental)", f_map_kf_incr, reps=16)

    def f_map_kf_full(c):
        st, out = mapping.map_step(
            st_full._replace(x6=st_full.x6 + c * 1e-12), scan_info_kf,
            feats, cfg.caps, cfg.params)
        return out.x6[0]

    timeit("map_step (kf, full rebuild)", f_map_kf_full, reps=16)

    print(json.dumps(results))


# ---------------------------------------------------------------- replay


def cmd_replay(args):
    jax = _jax()
    import jax.numpy as jnp
    import dataclasses as dc

    from scipy.spatial.transform import Rotation as Rsc
    from test_lvi_system import make_system
    from lvislam_tpu.utils import synthetic as syn
    from lvislam_tpu.models import replay as rp

    reps = args.reps
    on_tpu = jax.default_backend() != "cpu"
    from bench import apply_perf_knobs

    sys_ = make_system(pallas=on_tpu)
    sys_.cfg.replay_batch = 16
    apply_perf_knobs(sys_, pallas=on_tpu)  # bench operating point
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


# ------------------------------------------------------------- transport


def cmd_transport(args):
    jax = _jax()
    import jax.numpy as jnp

    from bench import _gen_scans, _make_cfg
    from lvislam_tpu.models.lio import mapping, pipeline as lp
    from lvislam_tpu.utils import synthetic as syn
    from lvislam_tpu.utils.profiling import hard_sync

    world = syn.default_world(seed=0)
    traj = syn.figure8_trajectory(scale=3.0, period=40.0)
    n_scans = 75
    scans = _gen_scans(n_scans, 10.0, world, traj)

    cfg = _make_cfg(mapping, pallas=jax.default_backend() != "cpu")
    pipe = lp.LioPipeline(cfg.lio if hasattr(cfg, "lio") else cfg)

    K = pipe.cfg.upload_batch
    print(f"upload_batch={K} pipelined={pipe.cfg.pipelined_uploads}",
          flush=True)

    t_pack = []
    t_upload = []
    t_dispatch = []
    t_scan_total = []

    orig_asarray = jnp.asarray
    orig_batch = pipe._batch_step

    def timed_asarray(x, *a, **kw):
        t0 = time.perf_counter()
        r = orig_asarray(x, *a, **kw)
        if getattr(x, "nbytes", 0) > 1 << 16:
            t_upload.append(time.perf_counter() - t0)
        return r

    def timed_batch(state, arr):
        t0 = time.perf_counter()
        r = orig_batch(state, arr)
        t_dispatch.append(time.perf_counter() - t0)
        return r

    lp.jnp.asarray = timed_asarray
    pipe._batch_step = timed_batch

    orig_pack = lp.pack_scan

    def timed_pack(*a, **kw):
        t0 = time.perf_counter()
        r = orig_pack(*a, **kw)
        t_pack.append(time.perf_counter() - t0)
        return r

    lp.pack_scan = timed_pack

    # warm-up (compile)
    for s in scans[:11]:
        scan, irt, ig, rpy = s[0], s[1], s[2], s[3]
        pipe.process_scan(scan, irt, ig, rpy)
    pipe.flush()
    hard_sync(pipe.state.x6)
    for lst in (t_pack, t_upload, t_dispatch):
        lst.clear()

    t_seg = time.perf_counter()
    for s in scans[11:]:
        t0 = time.perf_counter()
        scan, irt, ig, rpy = s[0], s[1], s[2], s[3]
        pipe.process_scan(scan, irt, ig, rpy)
        t_scan_total.append(time.perf_counter() - t0)
    pipe.flush()
    hard_sync(pipe.state.x6)
    wall = time.perf_counter() - t_seg
    n = len(scans) - 11

    def stat(name, xs):
        if not xs:
            print(f"{name:18s} (none)")
            return
        xs = np.asarray(xs) * 1e3
        print(f"{name:18s} n={len(xs):3d} mean={xs.mean():7.2f} ms "
              f"p50={np.percentile(xs, 50):7.2f} max={xs.max():7.2f} "
              f"-> {xs.sum() / n:6.2f} ms/scan", flush=True)

    print(f"\nwall {wall * 1e3 / n:.2f} ms/scan over {n} scans")
    stat("pack_scan", t_pack)
    stat("upload(K rows)", t_upload)
    stat("dispatch(batch)", t_dispatch)
    stat("process_scan", t_scan_total)


# ----------------------------------------------------------------- query


def cmd_query(args):
    jax = _jax()
    import jax.numpy as jnp

    from lvislam_tpu.ops import voxel_hash as vh

    K_REPS = 64
    T, B = 1 << 16, 16
    Q = 2048

    rng = np.random.default_rng(0)
    # realistic spatial coherence: map points over a 40 m cube, queries from
    # a lidar scan footprint (clustered)
    ms = jnp.asarray(rng.uniform(-20, 20, (65536, 3)), jnp.float32)
    msv = jnp.ones(65536, bool)
    h = vh.build(ms, msv, 1.0, T, B)
    q = jnp.asarray(rng.uniform(-12, 12, (Q, 3)), jnp.float32)

    results = {}

    def timeit(name, body_fn, *fargs):
        def prog(*a):
            def body(c, _):
                return body_fn(c, *a), None
            return jax.lax.scan(body, jnp.float32(0), None, length=K_REPS)[0]
        f = jax.jit(prog)
        out = f(*fargs); np.asarray(out).ravel()[:1]
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            out = f(*fargs); np.asarray(out).ravel()[:1]
            best = min(best, time.perf_counter() - t0)
        per = best / K_REPS * 1e3
        results[name] = round(per, 3)
        print(f"{name:44s} {per:8.3f} ms", flush=True)

    offs = jnp.stack(jnp.meshgrid(
        jnp.arange(-1, 2), jnp.arange(-1, 2), jnp.arange(-1, 2), indexing="ij"
    ), -1).reshape(27, 3)

    def slots_of(qq):
        qc = jnp.floor(qq / h.cell).astype(jnp.int32)
        cells = qc[:, None, :] + offs[None, :, :]
        return vh._slot(cells[..., 0], cells[..., 1], cells[..., 2], T), cells

    # V0: full query as shipped
    def v0(c, q):
        idx, dist = vh.query(h, q + c * 1e-9, 5)
        return dist[0, 0]
    timeit("V0 vh.query (baseline)", v0, q)

    # V1: the (Q,27) row gather alone (B,4 f16 rows)
    def v1(c, q):
        slots, _ = slots_of(q + c * 1e-9)
        cand = h.rel[slots]  # (Q,27,B,4)
        return jnp.sum(cand.astype(jnp.float32))
    timeit("V1 gather only (Q,27)->(B,4) f16", v1, q)

    # V2: gather rows from a flattened (T, B*4) layout
    rel_flat = h.rel.reshape(T, B * 4)
    def v2(c, q):
        slots, _ = slots_of(q + c * 1e-9)
        cand = rel_flat[slots]  # (Q,27,B*4)
        return jnp.sum(cand.astype(jnp.float32))
    timeit("V2 gather flat rows (T,B*4)", v2, q)

    # V3: dedup-gather: sort the 55k slot ids, gather unique rows only,
    # broadcast back via a second (small-table) gather
    def v3(c, q):
        slots, _ = slots_of(q + c * 1e-9)
        flat = slots.reshape(-1)  # (Q*27,)
        order = jnp.argsort(flat)
        s_sorted = flat[order]
        is_new = jnp.concatenate([jnp.ones(1, bool), s_sorted[1:] != s_sorted[:-1]])
        uniq_id = jnp.cumsum(is_new) - 1  # segment id per sorted position
        U = 4096  # cap on unique cells (27-neighborhoods of one scan)
        uniq_slot = jnp.zeros(U, jnp.int32).at[jnp.minimum(uniq_id, U - 1)].max(s_sorted)
        uniq_rows = rel_flat[uniq_slot]  # (U, B*4) gather: ~14x fewer rows
        rows_sorted = uniq_rows[jnp.minimum(uniq_id, U - 1)]  # (Q*27, B*4)
        inv = jnp.zeros_like(order).at[order].set(jnp.arange(order.shape[0]))
        cand = rows_sorted[inv]
        return jnp.sum(cand.astype(jnp.float32))
    timeit("V3 dedup-gather (sort+unique)", v3, q)

    # V4: int8 quantized bucket positions (half traffic of V2)
    rel_i8 = jnp.clip(
        jnp.round(h.rel.astype(jnp.float32) * 127.0 / 8.0), -127, 127
    ).astype(jnp.int8).reshape(T, B * 4)
    def v4(c, q):
        slots, _ = slots_of(q + c * 1e-9)
        cand = rel_i8[slots]
        return jnp.sum(cand.astype(jnp.float32))
    timeit("V4 gather int8 rows", v4, q)

    # V5: distance + top-k only (gather input precomputed once -> measures
    # the non-gather tail of vh.query)
    slots0, cells0 = slots_of(q)
    cand0 = h.rel[slots0]
    cnt0 = h.cnt[slots0]
    def v5(c, cand0, cnt0, q):
        occ = jnp.arange(B)[None, None, :] < cnt0[..., None]
        want = vh._tag(cells0[..., 0], cells0[..., 1], cells0[..., 2])
        occ &= cand0[..., 3].astype(jnp.float32) == want[..., None]
        corner = cells0.astype(q.dtype) * h.cell
        cand_abs = cand0[..., :3].astype(q.dtype) + corner[:, :, None, :]
        d = jnp.sum((cand_abs - (q + c * 1e-9)[:, None, None, :]) ** 2, -1)
        d = jnp.where(occ, d, 1e10).reshape(Q, 27 * B)
        nd, sel = jax.lax.top_k(-d, 5)
        return nd[0, 0]
    timeit("V5 distance+topk only", v5, cand0, cnt0, q)

    # V6: distance + iterative 5x max instead of top_k
    def v6(c, cand0, cnt0, q):
        occ = jnp.arange(B)[None, None, :] < cnt0[..., None]
        corner = cells0.astype(q.dtype) * h.cell
        cand_abs = cand0[..., :3].astype(q.dtype) + corner[:, :, None, :]
        d = jnp.sum((cand_abs - (q + c * 1e-9)[:, None, None, :]) ** 2, -1)
        d = jnp.where(occ, d, 1e10).reshape(Q, 27 * B)
        best = []
        for _ in range(5):
            i = jnp.argmin(d, axis=1)
            best.append(jnp.take_along_axis(d, i[:, None], 1))
            d = d.at[jnp.arange(Q), i].set(1e10)
        return best[-1][0, 0]
    timeit("V6 distance+5x argmin", v6, cand0, cnt0, q)

    print(json.dumps(results))


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    sub = ap.add_subparsers(dest="cmd", required=True)
    sub.add_parser("stages", help="per-stage device timing of the LIO step")
    p_replay = sub.add_parser("replay", help="batched fused LVI replay")
    p_replay.add_argument("reps", nargs="?", type=int, default=6)
    sub.add_parser("transport", help="host-side LIO replay transport")
    sub.add_parser("query", help="voxel-hash query kernel variants")
    args = ap.parse_args()
    {"stages": cmd_stages, "replay": cmd_replay,
     "transport": cmd_transport, "query": cmd_query}[args.cmd](args)


if __name__ == "__main__":
    main()
