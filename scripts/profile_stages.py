"""Per-stage device timing of the LIO hot path at bench shapes.

Each stage is timed amortized: the op is chained K times inside one jitted
`lax.scan` program (a tiny data dependence defeats DCE/overlap illusions),
dispatched once, then hard-synced via host readback — the only honest sync
on the axon attachment (NOTES.md: `block_until_ready` is a no-op there).

Usage: nohup python scripts/profile_stages.py > /tmp/profile.out 2>&1 &
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

    from lvislam_tpu.models.lio import mapping, frontend
    from lvislam_tpu.models.lio.pipeline import (
        LioConfig, LioPipeline, lio_full_step, POS_SCALE, TIME_SCALE,
    )
    from lvislam_tpu.ops import voxel_hash as vh, scan2map, pointcloud as pc
    from lvislam_tpu.utils import synthetic as syn

    K_REPS = 64
    rate = 10.0
    n_scan, horizon = 4, 6000
    P_CAP = 24576

    caps = mapping.LioCaps(
        max_keyframes=256, kf_corner=512, kf_surf=2048, sel_keyframes=32,
        map_corner=16384, map_surf=65536, scan_corner=512, scan_surf=2048,
        max_loops=16, max_gps=16, loop_submap=8192, icp_iters=20,
    )
    params = mapping.LioParams(nnRefreshEvery=2)

    world = syn.default_world(seed=0)
    traj = syn.figure8_trajectory(scale=3.0, period=40.0)
    scan = syn.simulate_lidar_scan(world, traj, 1.0, n_scan=n_scan,
                                   horizon=horizon, sweep_time=1.0 / rate)

    n = min(len(scan["xyz"]), P_CAP)
    xyz = np.zeros((P_CAP, 3), np.float32); xyz[:n] = scan["xyz"][:n]
    inten = np.zeros(P_CAP, np.float32); inten[:n] = scan["intensity"][:n]
    ring = np.zeros(P_CAP, np.int32); ring[:n] = scan["ring"][:n]
    rel_t = np.zeros(P_CAP, np.float32); rel_t[:n] = scan["time"][:n]
    pvalid = np.zeros(P_CAP, bool); pvalid[:n] = True

    it = np.arange(0.0, 1.0 / rate + 0.01, 1.0 / 200.0).astype(np.float32)
    M = 64
    imu_t = np.zeros(M, np.float32); imu_t[: len(it)] = it
    gyro = np.zeros((M, 3), np.float32)
    gyro[: len(it)] = traj.imu(it + 1.0)[0]
    imu_count = np.int32(len(it))

    d = {k: jnp.asarray(v) for k, v in dict(
        xyz=xyz, inten=inten, ring=ring, rel_t=rel_t, pvalid=pvalid,
        imu_t=imu_t, gyro=gyro,
    ).items()}
    rpy0 = jnp.zeros(3)

    results = {}

    def timeit(name, fn, *args):
        """fn(*args) -> output tree; chained K_REPS times in one program."""
        f = jax.jit(fn)
        out = f(*args)  # compile
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            out = f(*args)
            np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
            best = min(best, time.perf_counter() - t0)
        per = best / K_REPS * 1e3
        results[name] = round(per, 3)
        print(f"{name:36s} {per:8.3f} ms/iter", flush=True)
        return out

    # ---- stage 1: project_scan ----
    def proj_k(xyz, inten, ring, rel_t, pvalid, imu_t, gyro):
        def body(c, _):
            p = frontend.project_scan(
                xyz + c * 1e-9, inten, ring, rel_t, pvalid,
                imu_t, gyro, imu_count, rpy0, jnp.array(True),
                n_scan=n_scan, horizon=horizon)
            return p.xyz[0, 0], p
        return jax.lax.scan(body, jnp.float32(0), None, length=K_REPS)[1]

    proj_all = timeit("project_scan", proj_k, d["xyz"], d["inten"], d["ring"],
                      d["rel_t"], d["pvalid"], d["imu_t"], d["gyro"])
    proj = jax.tree.map(lambda x: x[0], proj_all)

    # ---- stage 2: extract_features ----
    def feat_k(proj):
        def body(c, _):
            p = proj._replace(xyz=proj.xyz + c * 1e-9)
            f = frontend.extract_features(
                p, surf_leaf=0.4, max_corner=caps.scan_corner,
                max_surf=caps.scan_surf)
            return f.corner_xyz[0, 0], f
        return jax.lax.scan(body, jnp.float32(0), None, length=K_REPS)[1]

    feats_all = timeit("extract_features", feat_k, proj)
    feats = jax.tree.map(lambda x: x[0], feats_all)

    # ---- build a realistic populated map state ----
    rng = np.random.default_rng(0)
    mc = jnp.asarray(rng.uniform(-20, 20, (caps.map_corner, 3)), jnp.float32)
    ms = jnp.asarray(rng.uniform(-20, 20, (caps.map_surf, 3)), jnp.float32)
    mcv = jnp.ones(caps.map_corner, bool)
    msv = jnp.ones(caps.map_surf, bool)
    ch = vh.build(mc, mcv, 1.0, caps.corner_hash_size, caps.hash_bucket)
    sh = vh.build(ms, msv, 1.0, caps.surf_hash_size, caps.surf_hash_bucket)

    # ---- stage 3: voxel-hash query (surf-sized) ----
    q = jnp.asarray(rng.uniform(-20, 20, (caps.scan_surf, 3)), jnp.float32)

    def query_k(q):
        def body(c, _):
            idx, dist = vh.query(sh, q + c * 1e-9, 5)
            return dist[0, 0], (idx, dist)
        return jax.lax.scan(body, jnp.float32(0), None, length=K_REPS)[1]

    timeit("vh.query surf (2048q,B16)", query_k, q)

    qc = jnp.asarray(rng.uniform(-20, 20, (caps.scan_corner, 3)), jnp.float32)

    def query_ck(qc):
        def body(c, _):
            idx, dist = vh.query(ch, qc + c * 1e-9, 5)
            return dist[0, 0], (idx, dist)
        return jax.lax.scan(body, jnp.float32(0), None, length=K_REPS)[1]

    timeit("vh.query corner (512q,B32)", query_ck, qc)

    # ---- stage 4: full scan-to-map GN ----
    x0 = jnp.zeros(6)

    def s2m_k(x0):
        def body(c, _):
            st = scan2map.scan_to_map_hashed(
                x0 + c * 1e-9, feats.corner_xyz, feats.corner_valid,
                feats.surf_xyz, feats.surf_valid, mc, ms, ch, sh,
                max_iters=20, nn_refresh_every=params.nnRefreshEvery)
            return st.x6[0], st
        return jax.lax.scan(body, jnp.float32(0), None, length=K_REPS)[1]

    timeit("scan_to_map_hashed (<=20it)", s2m_k, x0)

    # ---- stage 5: hash build (keyframe rebuild cost) ----
    def build_k(ms):
        def body(c, _):
            h = vh.build(ms + c * 1e-9, msv, 1.0, caps.surf_hash_size,
                         caps.surf_hash_bucket)
            return h.rel[0, 0, 0].astype(jnp.float32), h
        return jax.lax.scan(body, jnp.float32(0), None, length=K_REPS)[1]

    timeit("vh.build surf (65536)", build_k, ms)

    def build_ck(mc):
        def body(c, _):
            h = vh.build(mc + c * 1e-9, mcv, 1.0, caps.corner_hash_size,
                         caps.hash_bucket)
            return h.rel[0, 0, 0].astype(jnp.float32), h
        return jax.lax.scan(body, jnp.float32(0), None, length=K_REPS)[1]

    timeit("vh.build corner (16384)", build_ck, mc)

    # ---- stage 6: voxel_downsample at scan size ----
    def ds_k(xyz):
        def body(c, _):
            o, v, _ = pc.voxel_downsample(xyz + c * 1e-9, d["pvalid"], 0.4,
                                          caps.scan_surf)
            return o[0, 0], (o, v)
        return jax.lax.scan(body, jnp.float32(0), None, length=K_REPS)[1]

    timeit("voxel_downsample (24576->2048)", ds_k, d["xyz"])

    # ---- stage 7: local map assembly ----
    state = mapping.lio_init(caps)
    kf_c = jnp.asarray(rng.uniform(-20, 20, (caps.max_keyframes, caps.kf_corner, 3)), jnp.float32)
    kf_s = jnp.asarray(rng.uniform(-20, 20, (caps.max_keyframes, caps.kf_surf, 3)), jnp.float32)
    state = state._replace(
        kf_count=jnp.int32(40),
        kf_corner=kf_c, kf_corner_valid=jnp.ones(kf_c.shape[:2], bool),
        kf_surf=kf_s, kf_surf_valid=jnp.ones(kf_s.shape[:2], bool),
        kf_trans=jnp.asarray(rng.uniform(-10, 10, (caps.max_keyframes, 3)), jnp.float32),
        kf_time=jnp.asarray(np.arange(caps.max_keyframes) * 0.5, jnp.float32),
    )

    def asm_k(state):
        def body(c, _):
            s2 = state._replace(x6=state.x6 + c * 1e-9)
            out = mapping._assemble_local_map(s2, caps, params, jnp.float32(20.0))
            return out[0][0, 0], out
        return jax.lax.scan(body, jnp.float32(0), None, length=K_REPS)[1]

    timeit("_assemble_local_map", asm_k, state)

    # ---- stage 8: full map_step non-keyframe vs keyframe ----
    scan_info = dict(
        stamp=jnp.float32(20.0), imu_available=jnp.array(True),
        imu_rpy_init=jnp.zeros(3), odom_available=jnp.array(False),
        odom_trans=jnp.zeros(3), odom_quat=jnp.array([1.0, 0, 0, 0]),
        odom_reset_id=jnp.int32(0),
    )
    state = state._replace(
        map_corner=mc, map_corner_valid=mcv, map_surf=ms, map_surf_valid=msv,
        corner_hash=ch, surf_hash=sh, x6=jnp.zeros(6),
    )

    def step_k(state):
        def body(c, _):
            si = dict(scan_info); si["stamp"] = scan_info["stamp"] + c * 1e-6
            s2, out = mapping.map_step(state, si, feats, caps, params)
            return c + 1.0, out.x6
        return jax.lax.scan(body, jnp.float32(0), None, length=K_REPS)[1]

    timeit("map_step (incl kf-rebuild brs)", step_k, state)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
