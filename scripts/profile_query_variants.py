"""Experiments for the hot op: the 27-cell voxel-hash gather + top-5.

Round-2 profile: vh.query surf (2048 q, B=16) = 3.2 ms = ~350x off HBM
speed-of-light -> the row gather is latency/granularity-bound, not
bandwidth-bound. Variants measured here decide the Pallas kernel design.

Usage: nohup python scripts/profile_query_variants.py > /tmp/qvar.out 2>&1 &
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

    def timeit(name, body_fn, *args):
        def prog(*a):
            def body(c, _):
                return body_fn(c, *a), None
            return jax.lax.scan(body, jnp.float32(0), None, length=K_REPS)[0]
        f = jax.jit(prog)
        out = f(*args); np.asarray(out).ravel()[:1]
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            out = f(*args); np.asarray(out).ravel()[:1]
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


if __name__ == "__main__":
    main()
