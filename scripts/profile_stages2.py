"""Corrected per-stage timing: scan bodies return SCALARS only (stacking
full outputs across the K-rep lax.scan corrupted round-2's first numbers),
plus a sub-stage breakdown of project_scan.

Usage: nohup python scripts/profile_stages2.py > /tmp/profile2.out 2>&1 &
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
    from lvislam_tpu.ops import voxel_hash as vh, pointcloud as pc
    from lvislam_tpu.ops.preintegration import gyro_rotation_table
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
    imu_count = jnp.int32(len(it))

    d = {k: jnp.asarray(v) for k, v in dict(
        xyz=xyz, inten=inten, ring=ring, rel_t=rel_t, pvalid=pvalid,
        imu_t=imu_t, gyro=gyro,
    ).items()}
    rpy0 = jnp.zeros(3)

    results = {}

    def timeit(name, body_fn, *args):
        """body_fn(carry, args) -> scalar carry; chained K_REPS times."""
        def prog(*a):
            def body(c, _):
                return body_fn(c, *a), None
            return jax.lax.scan(body, jnp.float32(0), None, length=K_REPS)[0]
        f = jax.jit(prog)
        out = f(*args)
        np.asarray(out).ravel()[:1]
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            out = f(*args)
            np.asarray(out).ravel()[:1]
            best = min(best, time.perf_counter() - t0)
        per = best / K_REPS * 1e3
        results[name] = round(per, 3)
        print(f"{name:40s} {per:8.3f} ms/iter", flush=True)

    # ---- project_scan sub-stages ----
    def f_gyro_table(c, imu_t, gyro):
        dts = jnp.diff(imu_t, prepend=imu_t[0:1]) + c * 1e-12
        q = gyro_rotation_table(dts, gyro)[1:]
        return q[0, 0]

    timeit("gyro_rotation_table", f_gyro_table, d["imu_t"], d["gyro"])

    dts0 = jnp.diff(d["imu_t"], prepend=d["imu_t"][0:1])
    qtab = gyro_rotation_table(dts0, d["gyro"])[1:]

    def f_deskew(c, xyz, rel_t, imu_t, qtab):
        out = pc.deskew_points(xyz + c * 1e-9, rel_t, imu_t, qtab,
                               imu_count, rel_t[0])
        return out[0, 0]

    timeit("deskew_points (24576)", f_deskew, d["xyz"], d["rel_t"], d["imu_t"], qtab)

    def f_livox_cols(c, ring, pvalid):
        cols = pc.livox_columns(ring + (c * 0).astype(jnp.int32), pvalid, n_scan)
        return cols[0].astype(jnp.float32)

    timeit("livox_columns", f_livox_cols, d["ring"], d["pvalid"])

    cols0 = pc.livox_columns(d["ring"], d["pvalid"], n_scan)

    def f_project_img(c, xyz, inten, ring, pvalid, cols):
        r, x, i, v, t = pc.project_to_range_image(
            xyz + c * 1e-9, inten, ring, pvalid, n_scan, horizon,
            1.0, 100.0, columns=cols)
        return r[0, 0]

    timeit("project_to_range_image (scatter)", f_project_img, d["xyz"],
           d["inten"], d["ring"], d["pvalid"], cols0)

    rimg, ximg, iimg, vimg, _ = pc.project_to_range_image(
        d["xyz"], d["inten"], d["ring"], d["pvalid"], n_scan, horizon, 1.0, 100.0,
        columns=cols0)

    def f_compact(c, vimg, ximg):
        order, counts, s, e = pc.compact_rings(vimg ^ (c > 1e30), horizon)
        fx, fv = pc.gather_compacted(order, counts, ximg)
        return fx[0, 0]

    timeit("compact_rings + 1 gather", f_compact, vimg, ximg)

    def f_proj_full(c, xyz, inten, ring, rel_t, pvalid, imu_t, gyro):
        p = frontend.project_scan(
            xyz + c * 1e-9, inten, ring, rel_t, pvalid,
            imu_t, gyro, imu_count, rpy0, jnp.array(True),
            n_scan=n_scan, horizon=horizon)
        return p.xyz[0, 0]

    timeit("project_scan FULL", f_proj_full, d["xyz"], d["inten"], d["ring"],
           d["rel_t"], d["pvalid"], d["imu_t"], d["gyro"])

    # ---- vh.build, corrected ----
    rng = np.random.default_rng(0)
    ms = jnp.asarray(rng.uniform(-20, 20, (caps.map_surf, 3)), jnp.float32)
    mc = jnp.asarray(rng.uniform(-20, 20, (caps.map_corner, 3)), jnp.float32)
    msv = jnp.ones(caps.map_surf, bool)
    mcv = jnp.ones(caps.map_corner, bool)

    def f_build_s(c, ms):
        h = vh.build(ms + c * 1e-9, msv, 1.0, caps.surf_hash_size,
                     caps.surf_hash_bucket)
        return h.rel[0, 0, 0].astype(jnp.float32)

    timeit("vh.build surf (65536)", f_build_s, ms)

    def f_build_c(c, mc):
        h = vh.build(mc + c * 1e-9, mcv, 1.0, caps.corner_hash_size,
                     caps.hash_bucket)
        return h.rel[0, 0, 0].astype(jnp.float32)

    timeit("vh.build corner (16384)", f_build_c, mc)

    # ---- assemble, corrected ----
    params = mapping.LioParams(nnRefreshEvery=2)
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

    def f_asm(c, kf_trans):
        s2 = state._replace(x6=state.x6 + c * 1e-9, kf_trans=kf_trans)
        mco, mcv2, mso, msv2 = mapping._assemble_local_map(
            s2, caps, params, jnp.float32(20.0))
        return mco[0, 0]

    timeit("_assemble_local_map", f_asm, state.kf_trans)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
