"""Standalone device timing of the fused camera-frame branch's sub-ops at
the small-scale fused operating point (320x240, max_cnt=64, F=128, W=10)
— identifies where the ~9.5 ms/frame of `replay_batch_step`'s frame
branch goes (tracker / depth / BA / triangulation / marginalization),
since the branch itself has no per-op switches.

Usage: nohup python scripts/frame_breakdown.py > /tmp/frame_breakdown.log &
"""

from __future__ import annotations

import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

from bench import _timeit_device  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    print("backend:", jax.default_backend(), flush=True)

    from test_lvi_system import make_system

    s = make_system(pallas=False)
    cfg = s.cfg
    rng = np.random.default_rng(0)
    H, W_img = cfg.image_height, cfg.image_width

    # ---- tracker step (pyramid + KLT + RANSAC + refill) ----
    from lvislam_tpu.models.vio import feature_tracker as ft

    img = jnp.asarray(rng.random((H, W_img)), jnp.float32)
    st = ft.tracker_init(H, W_img, cfg.tracker)
    pts = jnp.asarray(np.stack([
        rng.uniform(20, W_img - 20, cfg.tracker.max_cnt),
        rng.uniform(20, H - 20, cfg.tracker.max_cnt),
    ], -1), jnp.float32)
    st = ft.seed_prev_image(st, img, cfg.tracker)._replace(
        pts=pts,
        ids=jnp.arange(cfg.tracker.max_cnt, dtype=jnp.int32),
        track_cnt=jnp.full(cfg.tracker.max_cnt, 5, jnp.int32),
    )

    def tr(c):
        st2, tout = ft.tracker_step(st, img + c * 1e-9, jnp.float32(1.0),
                                    cfg.tracker, cfg.camera)
        return tout.uv[0, 0]

    print("tracker_step_ms:", round(_timeit_device(tr, reps=16), 2),
          flush=True)

    # ---- depth registration at the fused ring shape ----
    P = min(cfg.depth_cloud_points, cfg.lio.caps.kf_surf)
    S = cfg.depth_cloud_slots
    norm = jnp.asarray(rng.uniform(-0.5, 0.5, (cfg.tracker.max_cnt, 2)),
                       jnp.float32)
    nv = jnp.ones(cfg.tracker.max_cnt, bool)
    cloud = jnp.asarray(rng.uniform(-10, 10, (S * P, 3)), jnp.float32)
    cv = jnp.ones(S * P, bool)
    tq = jnp.array([1.0, 0, 0, 0], jnp.float32)

    def dr(c):
        return ft.register_depth(norm + c * 1e-9, nv, cloud, cv,
                                 jnp.zeros(3), tq)[0]

    print("depth_reg_ms:", round(_timeit_device(dr, reps=16), 2), flush=True)

    # ---- consistent BA window fixture at the fused caps ----
    import dataclasses as dc

    from test_ba_marginalization import build_consistent_window
    from lvislam_tpu.ops import ba
    from lvislam_tpu.models.vio import feature_manager as fm

    caps, bcfg, ws, pints, table, G = build_consistent_window(
        W=cfg.vio_caps.window, F=cfg.vio_caps.max_features, seed=0)
    bcfg = dc.replace(bcfg, solver="schur", iterations=cfg.ba.iterations)
    feat_valid = table.ids >= 0

    def ba_step(c):
        res = ba.solve(
            ws._replace(Ps=ws.Ps + c * 1e-12), table.inv_depth, table.obs,
            table.vel, table.obs_valid, table.start_frame, feat_valid,
            table.lidar_flag, pints,
            jnp.ones(bcfg.window + 1, bool), ba.empty_prior(bcfg), G,
            jnp.float32(0.0), bcfg,
        )
        return res.ws.Ps[0, 0]

    print("ba_solve_ms:", round(_timeit_device(ba_step, reps=16), 2),
          flush=True)

    # ---- triangulate_all ----
    def tri_step(c):
        t2 = fm.triangulate_all(
            table._replace(inv_depth=jnp.full_like(table.inv_depth, -1.0)
                           + c * 1e-12),
            ws.Ps, ws.Qs, ws.tic, ws.qic, caps)
        return t2.inv_depth[0]

    print("triangulate_all_ms:", round(_timeit_device(tri_step, reps=16), 2),
          flush=True)

    # ---- marginalization (SRIF old-frame elimination) ----
    def marg_step(c):
        pr = ba.marginalize_old(
            ws._replace(Ps=ws.Ps + c * 1e-12), table.inv_depth, table.obs,
            table.vel, table.obs_valid, table.start_frame, feat_valid,
            table.lidar_flag, pints, jnp.ones(bcfg.window + 1, bool),
            ba.empty_prior(bcfg), G, jnp.float32(0.0), bcfg,
        )
        return pr.r[0]

    print("marginalize_old_ms:", round(_timeit_device(marg_step, reps=16), 2),
          flush=True)

    # ---- process_imu (per-frame window propagation) ----
    from lvislam_tpu.models.vio import estimator as est

    vio = est.vio_init(cfg.vio_caps, cfg.vio_params)
    M = cfg.vio_caps.imu_buf
    dts = jnp.full(M, 0.005, jnp.float32)
    accs = jnp.asarray(rng.normal(0, 1, (M, 3)) + [0, 0, 9.8], jnp.float32)
    gyrs = jnp.asarray(rng.normal(0, 0.1, (M, 3)), jnp.float32)

    def imu_step(c):
        v2 = est.process_imu(vio, dts + c * 1e-12, accs, gyrs,
                             cfg.vio_caps, cfg.vio_params)
        return v2.ws.Ps[0, 0]

    print("process_imu_ms:", round(_timeit_device(imu_step, reps=16), 2),
          flush=True)


if __name__ == "__main__":
    main()
