"""On-device bisect of the TPU-vs-CPU ATE parity gap (VERDICT r5 task #2).

Runs the bench's exact fused 7-s replay (bench._lvi_sequence, cached bits)
on the TPU under a matrix of Pallas/knob variants and prints each variant's
ATE next to the clean-CPU anchors, isolating which TPU-only code path moves
the trajectory. Also replays the standalone LIO bench sequence the same way.

Usage: nohup python scripts/bisect_tpu_parity.py [lvi|lio] ... &
(one TPU process at a time; never SIGTERM it — NOTES.md)
"""

from __future__ import annotations

import dataclasses as dc
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import bench  # noqa: E402


def lvi_variant(tag, pallas_knn, pallas_gn, gather_once, knobs=True,
                rebuild_every=None, nn_refresh=None):
    from lvislam_tpu.utils.metrics import ate_rmse

    t0 = time.time()
    s = bench._lvi_build_system(pallas=False, knobs=False)
    if knobs:
        bench.apply_perf_knobs(s, pallas=False)
    s.cfg.lio.caps = dc.replace(
        s.cfg.lio.caps, pallas_knn=pallas_knn, pallas_gn=pallas_gn)
    s.cfg.lio.params = dc.replace(
        s.cfg.lio.params, gatherOncePerScan=gather_once)
    if rebuild_every is not None:
        s.cfg.lio.params = dc.replace(
            s.cfg.lio.params, mapRebuildEvery=rebuild_every)
    if nn_refresh is not None:
        s.cfg.lio.params = dc.replace(
            s.cfg.lio.params, nnRefreshEvery=nn_refresh)
    feed, warm_s, timed_s, gt_of = bench._lvi_sequence()
    feed(s, 0.0, warm_s + timed_s)
    s.run()
    est = np.stack([x6[3:6] for _, x6 in s.trajectory])
    ate = float(ate_rmse(est, gt_of(s), align=True))
    print(json.dumps({"variant": tag, "ate": round(ate, 4),
                      "wall_s": round(time.time() - t0, 1)}), flush=True)
    return ate


def lio_variant(tag, pallas_knn, pallas_gn, gather_once):
    from lvislam_tpu.models.lio import mapping
    from lvislam_tpu.utils.metrics import ate_rmse

    t0 = time.time()
    scans = bench._lio_scans_data()[:91]
    gt_pos = np.stack([s[0]["true_pos"] for s in scans])
    cfg = bench._make_cfg(mapping, pallas=False)
    cfg.caps = dc.replace(cfg.caps, pallas_knn=pallas_knn,
                          pallas_gn=pallas_gn)
    cfg.params = dc.replace(cfg.params, gatherOncePerScan=gather_once)
    _, pipe = bench._replay(cfg, scans, 11, 40, 2)
    est = pipe.trajectory_array()[:, 3:6]
    ate = float(ate_rmse(est, gt_pos, align=True))
    print(json.dumps({"variant": tag, "ate": round(ate, 4),
                      "wall_s": round(time.time() - t0, 1)}), flush=True)
    return ate


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    print(json.dumps({"backend": jax.default_backend()}), flush=True)
    anchors = bench._load_anchors()
    print(json.dumps({"anchors": anchors}), flush=True)

    which = sys.argv[1:] or ["lvi"]
    if "lvi" in which:
        # order: cheapest-information-first
        lvi_variant("lvi_xla_only", False, False, False)     # pure XLA TPU
        lvi_variant("lvi_gn_only", False, True, False)
        lvi_variant("lvi_knn_only", True, False, False)
        lvi_variant("lvi_knn_gn", True, True, False)
        lvi_variant("lvi_all_pallas", True, True, True)      # bench config
    if "lio" in which:
        lio_variant("lio_xla_only", False, False, False)
        lio_variant("lio_gn_only", False, True, False)
        lio_variant("lio_knn_only", True, False, False)
        lio_variant("lio_all_pallas", True, True, True)      # bench config
    if "final" in which:
        # candidate round-5 bench configs at mapRebuildEvery=1
        lvi_variant("lvi_r1_knn_go", True, False, True, rebuild_every=1)
        lvi_variant("lvi_r1_all_pallas", True, True, True, rebuild_every=1)
        lio_variant("lio_knn_go", True, False, True)
    if "rebuild" in which:
        # isolate the incremental-map knob on TPU: XLA-only, all other
        # knobs at the bench set
        lvi_variant("lvi_xla_rebuild1", False, False, False, rebuild_every=1)
        lvi_variant("lvi_xla_rebuild4", False, False, False, rebuild_every=4)
        lvi_variant("lvi_xla_nn1", False, False, False, nn_refresh=1)


if __name__ == "__main__":
    main()
