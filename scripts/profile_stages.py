"""Per-stage device timing of the WARM LIO step at the bench operating
point (MID360 4x6000, pallas kNN, gather-once + nnRefreshEvery=2,
mapRebuildEvery=8): where does the ~8.4 ms device-resident floor go?

Times, on a state warmed by a 12-scan replay:
  - the full fused step (non-keyframe and forced-keyframe stamps)
  - each stage in isolation: unpack, project, features, downsample,
    scan-to-map GN, keyframe insert + incremental/full map update

Usage: nohup python scripts/profile_stages3.py > /tmp/profile3.out 2>&1 &
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
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


if __name__ == "__main__":
    main()
