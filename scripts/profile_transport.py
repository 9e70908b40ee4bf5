"""Host-side transport profile of batched LIO replay on the axon tunnel.

Times every host call in the steady-state replay loop — pack_scan, the
batched upload (`jnp.asarray`), and the batch dispatch — to show where the
per-scan gap between device-step time (~7 ms, profile_stages.py) and
replayed per-scan time (~12.5 ms, bench.py) goes. RPCs on this transport
cost ~25 ms each (NOTES.md), so the question is which host calls block on
an RPC and whether they overlap device execution.

Run on the live TPU: `nohup python scripts/profile_transport.py > out 2>&1 &`
"""
import sys
import time

sys.path.insert(0, ".")
import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
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

    def stat(name, xs, per_scan_div=1):
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


if __name__ == "__main__":
    main()
