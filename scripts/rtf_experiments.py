"""Measured-RTF experiments on the fused 12-s replay (VERDICT r5 task #3):
replay_batch sizing, BA iteration count, and worker-pipeline depth — each
variant reports (rtf, ate) so accuracy-neutral wins can go straight into
the bench configuration.

Usage: nohup python scripts/rtf_experiments.py [names...] &
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


def run_variant(tag, batch=16, ba_iters=None, pallas=True):
    from lvislam_tpu.utils.metrics import ate_rmse

    s = bench._lvi_build_system(pallas=pallas)
    s.cfg.replay_batch = batch
    if ba_iters is not None:
        s.cfg.ba = dc.replace(s.cfg.ba, iterations=ba_iters)
    feed, warm_s, timed_s, gt_of = bench._lvi_sequence()
    feed(s, 0.0, warm_s)
    s.run()
    feed(s, warm_s, warm_s + timed_s)
    t0 = time.perf_counter()
    s.run()
    wall = time.perf_counter() - t0
    est = np.stack([x6[3:6] for _, x6 in s.trajectory])
    ate = float(ate_rmse(est, gt_of(s), align=True))
    print(json.dumps({"variant": tag, "rtf": round(timed_s / wall, 2),
                      "ate": round(ate, 4)}), flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    print(json.dumps({"backend": jax.default_backend()}), flush=True)

    which = sys.argv[1:] or ["batch"]
    if "batch" in which:
        run_variant("batch16_control", batch=16)
        run_variant("batch32", batch=32)
        run_variant("batch24", batch=24)
    if "ba" in which:
        run_variant("ba3", batch=16, ba_iters=3)
        run_variant("ba3_b32", batch=32, ba_iters=3)


if __name__ == "__main__":
    main()
