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
- `query`: gather the 27 neighboring buckets, one fused distance + top-k.

TPU bandwidth design: the candidate gather dominates, so bucket positions
are stored CELL-RELATIVE in float16 (6 B/point instead of 16 B) (the query reconstructs
them against the queried cell's exact corner); reconstruction error is
< 1 mm over the 1 m cell, and the downstream coefficient stage recomputes exact f32 distances
from the 5 selected neighbors, so selection noise cannot corrupt geometry.
Hash collisions put foreign-cell points in a bucket; a per-point secondary
cell tag (an f16-exact 11-bit hash stored alongside the position) rejects
them at query time.
Bucket overflow drops candidates — with a 0.4 m-leaf map a 1 m³ cell holds
<= ~16 points, well under the default capacity.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

_BIG = jnp.float32(1e10)


class VoxelHash(NamedTuple):
    rel: jax.Array  # (T, B, 4) f16: cell-relative position + cell tag
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
    """Secondary 11-bit cell hash, exactly representable in float16.

    Combined ADDITIVELY (not XOR): XOR-multiplicative hashes share a
    structural collision family on negation-swapped coordinate pairs with
    the slot hash, so an independent combiner is required."""
    h = (
        cx.astype(jnp.uint32) * jnp.uint32(2654435761)
        + cy.astype(jnp.uint32) * jnp.uint32(1013904223)
        + cz.astype(jnp.uint32) * jnp.uint32(374761393)
    )
    h = h ^ (h >> 15)
    return (h & jnp.uint32(2047)).astype(jnp.float32)


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
    dst = jnp.where(keep, s_sorted * bucket_cap + rank, table_size * bucket_cap)

    tag = _tag(c[:, 0], c[:, 1], c[:, 2])
    rel4 = jnp.concatenate([points - corner_of_pt, tag[:, None]], axis=1)[order]
    rel = jnp.zeros((table_size * bucket_cap + 1, 4), jnp.float16)
    rel = rel.at[dst].set(rel4.astype(jnp.float16), mode="drop")
    idx = jnp.full(table_size * bucket_cap + 1, -1, jnp.int32)
    idx = idx.at[dst].set(order.astype(jnp.int32), mode="drop")
    cnt = jnp.zeros(table_size + 1, jnp.int32).at[
        jnp.minimum(s_sorted, table_size)
    ].add(keep.astype(jnp.int32))
    return VoxelHash(
        rel=rel[:-1].reshape(table_size, bucket_cap, 4),
        cnt=cnt[:-1],
        cell=jnp.asarray(cell, points.dtype),
        idx=idx[:-1].reshape(table_size, bucket_cap),
    )


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
    T, B, _ = h.rel.shape
    Q = queries.shape[0]
    qc = jnp.floor(queries / h.cell).astype(jnp.int32)
    offs = jnp.stack(jnp.meshgrid(
        jnp.arange(-1, 2), jnp.arange(-1, 2), jnp.arange(-1, 2), indexing="ij"
    ), -1).reshape(27, 3)
    cells = qc[:, None, :] + offs[None, :, :]  # (Q, 27, 3)
    slots = _slot(cells[..., 0], cells[..., 1], cells[..., 2], T)  # (Q, 27)
    # (no dedup of collided slots: the per-point cell tag partitions a
    # shared bucket between its colliding cells, and the 27 queried cells
    # are distinct, so each visit selects a disjoint subset)
    cand_rel = h.rel[slots]  # (Q, 27, B, 4) f16 — the big gather
    occ = jnp.arange(B)[None, None, :] < h.cnt[slots][..., None]
    # reject collision-foreign points by the secondary cell tag; survivors
    # belong to the queried cell, whose corner the query knows EXACTLY —
    # no per-bucket corner storage needed (collided buckets would have an
    # ambiguous corner anyway)
    want_tag = _tag(cells[..., 0], cells[..., 1], cells[..., 2])  # (Q, 27)
    occ &= cand_rel[..., 3].astype(jnp.float32) == want_tag[..., None]
    corner = cells.astype(queries.dtype) * h.cell  # (Q, 27, 3)
    cand_abs = cand_rel[..., :3].astype(queries.dtype) + corner[:, :, None, :]
    d = jnp.sum((cand_abs - queries[:, None, None, :]) ** 2, axis=-1)
    d = jnp.where(occ, d, _BIG)
    d = d.reshape(Q, 27 * B)
    nd, sel = jax.lax.top_k(-d, k)
    # recover global indices with a small (Q, k) gather
    sel_slot = jnp.take_along_axis(
        jnp.broadcast_to(slots[:, :, None], (Q, 27, B)).reshape(Q, 27 * B), sel, axis=1
    )
    sel_rank = sel % B
    out_idx = h.idx[sel_slot, sel_rank]
    return out_idx, -nd
