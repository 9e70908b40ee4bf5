"""Pallas TPU kernel: fused candidate scoring + top-k for the voxel-hash
gated 5-NN (`ops.voxel_hash`).

The XLA query splits into (a) the (Q, 27) bucket-row gather — HBM
latency-bound, XLA's gather is already near its floor — and (b) the tail:
reconstruct candidate offsets against each cell corner, mask
collision-foreign points by tag, squared distances, top-5. The XLA tail
materializes (Q, 27, 4, B) f32 candidates plus a (Q, 27·B) distance
tensor in HBM between fusions (~3 round trips of ~7 MB) and runs a
generic `top_k`.

Kernel design (v2 — full-width, zero narrow slices): the gathered block
keeps its natural planar layout `27 x [B·x | B·y | B·z | B·tag]` and the
caller pre-expands a matching f32 ADDEND laneplan: x/y/z lanes hold
`corner_component - query_component` (scaled), tag lanes hold the NEGATED
wanted tag. The kernel is then pure full-width VPU work:

    S  = cand.f32 + addend            # per-lane offsets; tag lanes: 0 iff match
    sq = S*S
    d  = sq + roll(sq, -B) + roll(sq, -2B)   # x²+y²+z² lands on x-lanes
    ok = roll(S == 0, -3B)                   # tag match lands on x-lanes
    top-5 = five min/argmin passes over the x-lane-masked distances

Per-lane j-slicing (the v1 kernel) made Mosaic relayout every 64-lane
unaligned slice — 0.97 ms/call; v2 is a handful of full-width passes.
Tie order (lane-ascending) maps to the same (cell, rank) lexicographic
order as `jax.lax.top_k` over the flat candidate axis.

Reference behavior covered: `mapOptimization.cpp:1016-1022` (PCL
`nearestKSearch` 5-NN inside `cornerOptimization`/`surfOptimization`);
selection semantics identical to `voxel_hash.query` (identical f32 op
order in the scaled domain -> bit-identical top-k).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e10
_SPENT = 1e30  # already-selected sentinel, strictly above _BIG
_N_OFF = 27  # 3x3x3 cell neighborhood


def _tail_kernel(cand_ref, addend_ref, dist_ref, pos_ref, *, bucket: int,
                 k: int):
    """One query block: cand (G, 27*4B) i16 planar bucket rows,
    addend (G, 27*4B) f32 laneplan. Outputs dist (G, k) f32 scaled sqdist
    and pos (G, k) int32 LANE index (j*4B + rank)."""
    B = bucket
    L = _N_OFF * 4 * B
    S = cand_ref[:].astype(jnp.float32) + addend_ref[:]
    sq = S * S
    # pltpu.roll takes non-negative shifts: out[l] = in[(l - shift) % L],
    # so pulling lane l+s down to l is shift = L - s
    d = sq + pltpu.roll(sq, L - B, 1) + pltpu.roll(sq, L - 2 * B, 1)
    ok = pltpu.roll(jnp.where(S == 0.0, 1.0, 0.0), L - 3 * B, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    is_x = (lane % (4 * B)) < B
    d = jnp.where((ok > 0.5) & is_x, d, _BIG)

    for t in range(k):
        m = jnp.min(d, axis=1, keepdims=True)  # (G, 1)
        # first lane achieving the min (matches top_k tie order: equal
        # values resolve to the lowest lane, including saturated _BIG runs)
        am = jnp.min(jnp.where(d == m, lane, jnp.int32(2 ** 30)),
                     axis=1, keepdims=True)
        dist_ref[:, t:t + 1] = jnp.minimum(m, _BIG)
        pos_ref[:, t:t + 1] = am
        # invalidate ABOVE _BIG so exhausted queries still advance through
        # distinct lanes exactly like top_k does
        d = jnp.where(lane == am, _SPENT, d)


@partial(jax.jit, static_argnames=("bucket", "k", "block_q", "interpret"))
def topk_tail(
    cand: jax.Array,  # (Q, 27*4B) i16 gathered planar bucket rows
    want_tag: jax.Array,  # (Q, 27) i32 wanted cell tag per offset
    corner_off: jax.Array,  # (Q, 81) f32 scaled [27cx|27cy|27cz] - query
    bucket: int,
    k: int = 5,
    block_q: int = 256,
    interpret: bool = False,
):
    """Fused distance + tag mask + top-k over the gathered candidates.
    Returns (scaled sqdist (Q,k) f32, flat position (Q,k) int32 j*B+rank)."""
    Q = cand.shape[0]
    B = bucket
    # laneplan addend: per cell j, [B x-off | B y-off | B z-off | B -tag]
    per_j = jnp.stack(
        [
            corner_off[:, 0 * _N_OFF:1 * _N_OFF],
            corner_off[:, 1 * _N_OFF:2 * _N_OFF],
            corner_off[:, 2 * _N_OFF:3 * _N_OFF],
            -want_tag.astype(jnp.float32),
        ],
        axis=2,
    )  # (Q, 27, 4)
    addend = jnp.repeat(per_j, B, axis=2).reshape(Q, _N_OFF * 4 * B)

    pad = (-Q) % block_q
    if pad:
        cand = jnp.pad(cand, ((0, pad), (0, 0)), constant_values=-1)
        addend = jnp.pad(addend, ((0, pad), (0, 0)))
    Qp = Q + pad

    grid = Qp // block_q
    dist, lane_pos = pl.pallas_call(
        partial(_tail_kernel, bucket=B, k=k),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((block_q, _N_OFF * 4 * B), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, _N_OFF * 4 * B), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_q, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Qp, k), jnp.float32),
            jax.ShapeDtypeStruct((Qp, k), jnp.int32),
        ),
        interpret=interpret,
    )(cand, addend)

    # lane index (j*4B + rank, rank < B by construction) -> flat j*B + rank
    j = lane_pos // (4 * B)
    rank = lane_pos % (4 * B)
    pos = j * B + jnp.minimum(rank, B - 1)
    return dist[:Q], pos[:Q]
