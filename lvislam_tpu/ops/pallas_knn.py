"""Pallas TPU kernel: fused candidate scoring + top-k for the voxel-hash
gated 5-NN (`ops.voxel_hash`).

The XLA query splits into (a) the (Q, 27) bucket-row gather — HBM
latency-bound, XLA's gather is already near its floor — and (b) the tail:
reconstruct candidate offsets against each cell corner, mask
collision-foreign points by tag, squared distances, top-5. The XLA tail
materializes (Q, 27, 4, B) f32 candidates plus a (Q, 27·B) distance
tensor in HBM between fusions (~3 round trips of ~7 MB) and runs a
generic `top_k`; measured 0.62-0.64 ms at surf shapes (Q=2048, B=16) —
~10x off bandwidth speed-of-light.

This kernel fuses the whole tail in VMEM: the gathered block streams in
once, distances live in a VMEM scratch, and top-k is k vectorized
min/argmin passes (profiled faster than `top_k` at this width: 0.618 vs
0.644 ms even in XLA). Layout contract with `voxel_hash.build`: bucket
rows are COMPONENT-PLANAR int16 `[B·x | B·y | B·z | B·tag]` (the Mosaic
TPU dialect rejects f16), so every plane is a static lane slice — zero
in-kernel transposes or strided loads. Geometry arrives pre-scaled to
fixed-point steps with the query already folded into the corner offset,
so the kernel is pure `(cand + off)²` + tag mask + top-k; the caller
rescales distances to meters². Empty lanes carry tag -1 and are rejected
by the tag match (no separate occupancy input).

Reference behavior covered: `mapOptimization.cpp:1016-1022` (PCL
`nearestKSearch` 5-NN inside `cornerOptimization`/`surfOptimization`);
selection semantics identical to `voxel_hash.query` (identical op order
in the scaled domain -> bit-identical top-k).
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


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _tail_kernel(cand_ref, tag_ref, corner_ref, dist_ref, pos_ref,
                 d_scr, *, bucket: int, k: int):
    """One query block.

    cand (G, 27*4B) i16: 27 planar bucket rows [Bx|By|Bz|Btag];
    tag (G, 32) i32: wanted cell tag per offset (27 used);
    corner (G, 128) f32: planar scaled corner-minus-query offsets
    [27cx|27cy|27cz] (81 used).
    Outputs dist (G, k) f32 scaled sqdist, pos (G, k) int32 (j*B + rank).
    d_scr (G, Cpad) f32 scratch holds all 27*B candidate distances."""
    B = bucket
    d_scr[:] = jnp.full_like(d_scr[:], _BIG)
    for j in range(_N_OFF):
        s = cand_ref[:, j * 4 * B:(j + 1) * 4 * B]  # (G, 4B) i16
        cx = corner_ref[:, j:j + 1]
        cy = corner_ref[:, _N_OFF + j:_N_OFF + j + 1]
        cz = corner_ref[:, 2 * _N_OFF + j:2 * _N_OFF + j + 1]
        dx = s[:, 0 * B:1 * B].astype(jnp.float32) + cx
        dy = s[:, 1 * B:2 * B].astype(jnp.float32) + cy
        dz = s[:, 2 * B:3 * B].astype(jnp.float32) + cz
        d = dx * dx + dy * dy + dz * dz
        ok = s[:, 3 * B:4 * B].astype(jnp.int32) == tag_ref[:, j:j + 1]
        d_scr[:, j * B:(j + 1) * B] = jnp.where(ok, d, _BIG)

    d = d_scr[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
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
    pad = (-Q) % block_q
    if pad:
        cand = jnp.pad(cand, ((0, pad), (0, 0)), constant_values=-1)
        want_tag = jnp.pad(want_tag, ((0, pad), (0, 0)))
        corner_off = jnp.pad(corner_off, ((0, pad), (0, 0)))
    Qp = Q + pad
    # lane-pad the small per-query inputs to full vregs
    tag_p = jnp.pad(want_tag, ((0, 0), (0, 32 - _N_OFF)))
    corner_p = jnp.pad(corner_off, ((0, 0), (0, 128 - 3 * _N_OFF)))
    c_pad = _round_up(_N_OFF * B, 128)

    grid = Qp // block_q
    dist, pos = pl.pallas_call(
        partial(_tail_kernel, bucket=B, k=k),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((block_q, _N_OFF * 4 * B), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, 32), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, 128), lambda i: (i, 0),
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
        scratch_shapes=[pltpu.VMEM((block_q, c_pad), jnp.float32)],
        interpret=interpret,
    )(cand, tag_p, corner_p)

    return dist[:Q], pos[:Q]
