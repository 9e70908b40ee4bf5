"""Voxel-hash spatial index for gated kNN.

The scan-to-map correspondences only accept neighbors with squared distance
< 1.0 m² (`mapOptimization.cpp:1025,1110`), so with a 1 m cell the true
5-NN of any *accepted* correspondence lie inside the 27-cell neighborhood:
a bucketed voxel hash makes the search exact for every correspondence the
solver uses, at O(27·bucket) candidates per query instead of O(M) — the
kd-tree replacement SURVEY.md §7(a) calls for, built as two fixed-shape
tensor ops:

- `build`: sort points by hash slot once per local-map rebuild (keyframe
  rate), scatter into bucketed storage;
- `query`: gather the 27 neighboring buckets, one fused distance + top-k
  (`query_fused` runs the post-gather tail as a Pallas VMEM kernel).

TPU bandwidth design: the candidate gather dominates, so bucket positions
are stored CELL-RELATIVE as int16 fixed-point — `round(rel/cell * 2048)`,
<= 0.25 mm reconstruction error (the query reconstructs absolute positions
against the queried cell's exact corner) — and the downstream coefficient
stage recomputes exact f32 distances from the 5 selected neighbors, so
selection noise cannot corrupt geometry. int16 (not f16) because the
Mosaic TPU dialect rejects f16, and the 11-bit cell tag is exact in i16.
Storage is COMPONENT-PLANAR — `rel[(T, 4, B)]` rows laid out
`[B·x | B·y | B·z | B·tag]` — so the gathered block feeds the Pallas tail
kernel with zero transposes (static lane slices per plane).
Hash collisions put foreign-cell points in a bucket; a per-point secondary
cell tag (an 11-bit hash stored in the fourth plane) rejects them at query
time; empty lanes carry tag -1, so the tag match doubles as the occupancy
mask.
Bucket overflow drops candidates — with a 0.4 m-leaf map a 1 m³ cell holds
<= ~16 points, well under the default capacity.

Both query paths score candidates in the SCALED integer domain
(`(cand + (corner - q)/scale)²·scale²`, `scale = cell/2048`) with
identical op order, so `query` and `query_fused` select bit-identically.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

_BIG = jnp.float32(1e10)


_QUANT = 2048.0  # fixed-point steps per cell (int16 planes)


class VoxelHash(NamedTuple):
    rel: jax.Array  # (T, 4, B) i16 planar: [x|y|z|tag] cell-relative
    cnt: jax.Array  # (T,) int32 points per bucket
    cell: jax.Array  # () cell size
    idx: jax.Array  # (T, B) int32 global indices into the original array


def _slot(cx, cy, cz, table_size):
    h = (
        cx.astype(jnp.uint32) * jnp.uint32(73856093)
        ^ cy.astype(jnp.uint32) * jnp.uint32(19349669)
        ^ cz.astype(jnp.uint32) * jnp.uint32(83492791)
    )
    return (h & jnp.uint32(table_size - 1)).astype(jnp.int32)


def _tag(cx, cy, cz):
    """Secondary 11-bit cell hash.

    Combined ADDITIVELY (not XOR): XOR-multiplicative hashes share a
    structural collision family on negation-swapped coordinate pairs with
    the slot hash, so an independent combiner is required."""
    h = (
        cx.astype(jnp.uint32) * jnp.uint32(2654435761)
        + cy.astype(jnp.uint32) * jnp.uint32(1013904223)
        + cz.astype(jnp.uint32) * jnp.uint32(374761393)
    )
    h = h ^ (h >> 15)
    return (h & jnp.uint32(2047)).astype(jnp.int32)


@partial(jax.jit, static_argnames=("table_size", "bucket_cap"))
def build(
    points: jax.Array,  # (M, 3)
    valid: jax.Array,  # (M,)
    cell: float,
    table_size: int = 1 << 16,
    bucket_cap: int = 32,
) -> VoxelHash:
    M = points.shape[0]
    c = jnp.floor(points / cell).astype(jnp.int32)
    corner_of_pt = c.astype(points.dtype) * cell
    slot = jnp.where(valid, _slot(c[:, 0], c[:, 1], c[:, 2], table_size), table_size)
    order = jnp.argsort(slot)
    s_sorted = slot[order]
    is_new = jnp.concatenate([jnp.ones(1, bool), s_sorted[1:] != s_sorted[:-1]])
    run_start = jax.lax.cummax(jnp.where(is_new, jnp.arange(M), 0))
    rank = jnp.arange(M) - run_start
    keep = (s_sorted < table_size) & (rank < bucket_cap)
    # planar destination: component c of point -> slot*4B + c*B + rank
    base = jnp.where(keep, s_sorted * (4 * bucket_cap) + rank, -1)

    tag = _tag(c[:, 0], c[:, 1], c[:, 2])
    rel_q = jnp.round(
        (points - corner_of_pt) * (_QUANT / cell)
    ).astype(jnp.int16)
    rel4 = jnp.concatenate(
        [rel_q, tag[:, None].astype(jnp.int16)], axis=1
    )[order]
    dst = base[:, None] + jnp.arange(4) * bucket_cap  # (M, 4); -1 rows drop
    dst = jnp.where(base[:, None] >= 0, dst, table_size * 4 * bucket_cap)
    flat = jnp.full(table_size * 4 * bucket_cap + 1, -1, jnp.int16)
    flat = flat.at[dst.reshape(-1)].set(rel4.reshape(-1), mode="drop")
    dsti = jnp.where(keep, s_sorted * bucket_cap + rank, table_size * bucket_cap)
    idx = jnp.full(table_size * bucket_cap + 1, -1, jnp.int32)
    idx = idx.at[dsti].set(order.astype(jnp.int32), mode="drop")
    cnt = jnp.zeros(table_size + 1, jnp.int32).at[
        jnp.minimum(s_sorted, table_size)
    ].add(keep.astype(jnp.int32))
    return VoxelHash(
        rel=flat[:-1].reshape(table_size, 4, bucket_cap),
        cnt=cnt[:-1],
        cell=jnp.asarray(cell, points.dtype),
        idx=idx[:-1].reshape(table_size, bucket_cap),
    )


import numpy as _np


@jax.jit
def insert(
    h: VoxelHash,
    points: jax.Array,  # (N, 3) new points (world frame)
    valid: jax.Array,  # (N,)
    global_idx: jax.Array,  # (N,) indices these points hold in the map array
) -> VoxelHash:
    """Incremental scatter-insert into an existing hash — the keyframe-rate
    alternative to a full `build` (which argsorts the whole map). N is the
    new keyframe's cloud (~2.5k points), not the 80k-point map. Bucket
    overflow drops points exactly like `build`."""
    T, _, B = h.rel.shape
    N = points.shape[0]
    c = jnp.floor(points / h.cell).astype(jnp.int32)
    slot = jnp.where(valid, _slot(c[:, 0], c[:, 1], c[:, 2], T), T)
    order = jnp.argsort(slot)
    s = slot[order]
    is_new = jnp.concatenate([jnp.ones(1, bool), s[1:] != s[:-1]])
    run_start = jax.lax.cummax(jnp.where(is_new, jnp.arange(N), 0))
    rank_in_batch = jnp.arange(N) - run_start
    base = h.cnt[jnp.minimum(s, T - 1)]
    rank = base + rank_in_batch
    keep = (s < T) & (rank < B)

    tag = _tag(c[:, 0], c[:, 1], c[:, 2])
    rel_q = jnp.round(
        (points - c.astype(points.dtype) * h.cell) * (_QUANT / h.cell)
    ).astype(jnp.int16)
    rel4 = jnp.concatenate(
        [rel_q, tag[:, None].astype(jnp.int16)], axis=1
    )[order]

    base_dst = jnp.where(keep, s * (4 * B) + rank, T * 4 * B)
    dst = base_dst[:, None] + jnp.arange(4) * B
    dst = jnp.where(base_dst[:, None] < T * 4 * B, dst, T * 4 * B)
    rel_flat = h.rel.reshape(-1)
    rel_flat = jnp.concatenate([rel_flat, jnp.zeros(1, jnp.int16)])
    rel_flat = rel_flat.at[dst.reshape(-1)].set(rel4.reshape(-1), mode="drop")

    dsti = jnp.where(keep, s * B + rank, T * B)
    idx_flat = jnp.concatenate([h.idx.reshape(-1), jnp.zeros(1, jnp.int32)])
    idx_flat = idx_flat.at[dsti].set(global_idx[order], mode="drop")

    cnt = h.cnt.at[s].add(keep.astype(jnp.int32), mode="drop")
    return VoxelHash(
        rel=rel_flat[:-1].reshape(T, 4, B),
        cnt=cnt,
        cell=h.cell,
        idx=idx_flat[:-1].reshape(T, B),
    )


# 3x3x3 neighborhood offsets, kept as numpy so jit traces fold it into a
# constant (a module-level jnp array created mid-trace leaks the tracer)
_OFFS27 = _np.stack(_np.meshgrid(
    _np.arange(-1, 2), _np.arange(-1, 2), _np.arange(-1, 2), indexing="ij",
), -1).reshape(27, 3)


def _offs27():
    return jnp.asarray(_OFFS27)


def _neighborhood(h: VoxelHash, queries: jax.Array):
    """Shared query prologue: (Q,27) slots, wanted tags, and the SCALED
    geometry — query positions and cell corners in fixed-point steps
    (`p / (cell/QUANT)`), the domain both query paths score in."""
    T = h.rel.shape[0]
    qc = jnp.floor(queries / h.cell).astype(jnp.int32)
    cells = qc[:, None, :] + _offs27()[None, :, :]  # (Q, 27, 3)
    slots = _slot(cells[..., 0], cells[..., 1], cells[..., 2], T)  # (Q, 27)
    want_tag = _tag(cells[..., 0], cells[..., 1], cells[..., 2])  # (Q, 27)
    corner_s = cells.astype(jnp.float32) * _QUANT  # (Q, 27, 3) scaled corner
    q_s = queries.astype(jnp.float32) * (_QUANT / h.cell)  # (Q, 3) scaled
    return slots, want_tag, corner_s, q_s


def _recover_idx(h: VoxelHash, slots: jax.Array, pos: jax.Array, B: int):
    """Map flat candidate positions (j*B + rank) back to global indices.
    Positions beyond the real candidate range (lane padding in the fused
    kernel, selectable only when a query has < k candidates) map to -1."""
    in_range = pos < 27 * B
    pos = jnp.minimum(pos, 27 * B - 1)
    j = pos // B
    rank = pos % B
    sel_slot = jnp.take_along_axis(slots, j, axis=1)
    return jnp.where(in_range, h.idx[sel_slot, rank], -1)


@partial(jax.jit, static_argnames=("k",))
def query(
    h: VoxelHash,
    queries: jax.Array,  # (Q, 3)
    k: int = 5,
):
    """Gated k-NN: returns (idx (Q,k) into the ORIGINAL point array,
    approx sqdist (Q,k), <1 mm reconstruction error — recompute exact
    distances downstream from the gathered neighbors when it matters).
    Neighbors beyond the 27-cell reach report _BIG."""
    T, _, B = h.rel.shape
    Q = queries.shape[0]
    slots, want_tag, corner_s, q_s = _neighborhood(h, queries)
    # (no dedup of collided slots: the per-point cell tag partitions a
    # shared bucket between its colliding cells, and the 27 queried cells
    # are distinct, so each visit selects a disjoint subset)
    cand = h.rel[slots]  # (Q, 27, 4, B) i16 — the big gather
    # empty lanes carry tag -1 -> the tag match is also the occupancy mask
    occ = cand[:, :, 3, :].astype(jnp.int32) == want_tag[..., None]
    diff = (
        cand[:, :, :3, :].astype(jnp.float32)
        + (corner_s - q_s[:, None, :])[:, :, :, None]
    )
    d = jnp.sum(diff * diff, axis=2)  # (Q, 27, B) scaled sqdist
    d = jnp.where(occ, d, _BIG)
    d = d.reshape(Q, 27 * B)
    nd, sel = jax.lax.top_k(-d, k)
    out_idx = _recover_idx(h, slots, sel, B)
    scale2 = (h.cell / _QUANT) ** 2
    # masked lanes keep the _BIG sentinel (not rescaled)
    return out_idx, jnp.where(-nd >= _BIG, _BIG, -nd * scale2)


class GatheredCandidates(NamedTuple):
    """One (Q, 27)-neighborhood gather, reusable across GN iterations.

    Re-scoring against the cached 27-cell box is EXACT while the query
    stays inside its gather-time cell; a query that crosses a cell
    boundary loses the gate-region sliver beyond the cached box (up to its
    displacement). Warm-started scan-match iterations move queries mm-cm,
    so only the boundary-adjacent fraction is affected, and the
    coefficient stage's exact-distance recompute still gates every
    accepted pair — while the HBM-latency-bound row gather (the dominant
    query cost) leaves the loop entirely."""

    slots: jax.Array  # (Q, 27)
    want_tag: jax.Array  # (Q, 27)
    corner_s: jax.Array  # (Q, 27, 3) scaled cell corners (cells are FIXED)
    cand: jax.Array  # (Q, 27*4*B) planar rows


@jax.jit
def query_gather(h: VoxelHash, queries: jax.Array) -> GatheredCandidates:
    """The gather half of `query_fused`: fetch the (Q, 27) neighborhood
    bucket rows once, for repeated re-scoring at updated query positions."""
    T, _, B = h.rel.shape
    Q = queries.shape[0]
    slots, want_tag, corner_s, _ = _neighborhood(h, queries)
    cand = h.rel[slots].reshape(Q, 27 * 4 * B)
    return GatheredCandidates(
        slots=slots, want_tag=want_tag, corner_s=corner_s, cand=cand
    )


@partial(jax.jit, static_argnames=("k", "interpret"))
def query_score(
    h: VoxelHash,
    g: GatheredCandidates,
    queries: jax.Array,  # (Q, 3) CURRENT query positions
    k: int = 5,
    interpret: bool = False,
):
    """Score cached candidates against updated query positions (the
    Pallas fused tail). Exact for queries still inside their gather-time
    cell; boundary-crossers may miss edge-of-box candidates (the
    downstream exact-distance recompute still gates)."""
    from . import pallas_knn

    T, _, B = h.rel.shape
    Q = queries.shape[0]
    q_s = queries.astype(jnp.float32) * (_QUANT / h.cell)
    corner_off = (g.corner_s - q_s[:, None, :]).transpose(0, 2, 1).reshape(
        Q, 3 * 27
    )
    dist_s, pos = pallas_knn.topk_tail(
        g.cand, g.want_tag, corner_off, bucket=B, k=k, interpret=interpret,
    )
    out_idx = _recover_idx(h, g.slots, pos, B)
    scale2 = (h.cell / _QUANT) ** 2
    # masked lanes keep the _BIG sentinel (not rescaled)
    return out_idx, jnp.where(dist_s >= _BIG, _BIG, dist_s * scale2)


@partial(jax.jit, static_argnames=("k", "interpret"))
def query_fused(
    h: VoxelHash,
    queries: jax.Array,  # (Q, 3)
    k: int = 5,
    interpret: bool = False,
):
    """`query` with the post-gather tail (dequant + tag mask + distance +
    top-k) fused into a single Pallas VMEM kernel (`ops.pallas_knn`) —
    same selection semantics, no HBM round trips for the candidate and
    distance tensors. `interpret=True` runs the kernel in interpreter mode
    (CPU tests)."""
    return query_score(h, query_gather(h, queries), queries, k=k,
                       interpret=interpret)
