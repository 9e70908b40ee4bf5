"""Pallas TPU kernels for CLAHE (cv::CLAHE equivalent, used by the visual
front-end at `feature_tracker.cpp:86-92`).

The XLA formulation (`ops.image.clahe`) is a `lax.scan` over the 256 bins
for both phases; every iteration re-reads the bin image and re-writes the
(H, W) accumulator in HBM — ~1.8 GB of traffic at 1024x576, ~2.7 ms on a
v5e chip. Here both phases keep their state in VMEM and read the image
exactly once:

- `tile_hist`: one grid program per tile ROW. The (th, W) bin block and
  the (Tx, B) accumulator live in VMEM; the per-bin tile counts accumulate
  with a mask-FMA against a lane iota (no dynamic stores).
- `apply_lut`: the bilinear CDF interpolation is separable. The x-pass is
  precomputed in XLA as VxT[t, b, x] = sum_s Ux[x, s] * cdf[t, s, b] (a
  tiny (Tx, B) x (Tx, W) matmul per tile row). The kernel then runs one
  grid program per 72-row block: rows of block i only ever interpolate
  tile rows {i-1, i, i+1} (clamped), so three dynamic VMEM row loads per
  bin and a per-row 3-tap weight (two nonzeros) reproduce the exact
  bilinear field; accumulation is select-add against the block's bin ids.

Bit-compatible with the XLA path up to fp reassociation (~1e-6, tested in
`tests/test_visual_ops.py`). Kernels are gated to lane-friendly shapes
(tw % 128 == 0, th % 8 == 0 — the shipped 1024x576 rig qualifies);
`ops.image.clahe` falls back to the scan form otherwise.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _hist_kernel(bins_ref, hist_ref, *, tiles: int, tw: int, n_bins: int):
    th = bins_ref.shape[0]
    bins = bins_ref[:]  # (th, Tx*tw) int32
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (tiles, n_bins), 1)

    def body(b, acc):
        m = (bins == b).astype(jnp.float32)
        cnt = jnp.sum(m.reshape(th, tiles, tw), axis=(0, 2))  # (Tx,)
        return acc + cnt[:, None] * (col_iota == b).astype(jnp.float32)

    hist_ref[0, :, :] = jax.lax.fori_loop(
        0, n_bins, body, jnp.zeros((tiles, n_bins), jnp.float32)
    )


@partial(jax.jit, static_argnames=("tiles", "n_bins", "interpret"))
def tile_hist(bins: jax.Array, tiles: int = 8, n_bins: int = 256,
              interpret: bool | None = None) -> jax.Array:
    """Per-tile histograms of an (H, W) int32 bin image (H, W divisible by
    `tiles`, W/tiles a lane multiple). Returns (tiles*tiles, n_bins) f32 in
    tile row-major order."""
    if interpret is None:  # CPU backend: emulate (tests force the
        interpret = jax.default_backend() == "cpu"  # pallas path there)
    H, W = bins.shape
    th, tw = H // tiles, W // tiles
    hist = pl.pallas_call(
        partial(_hist_kernel, tiles=tiles, tw=tw, n_bins=n_bins),
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((th, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tiles, n_bins), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tiles, tiles, n_bins), jnp.float32),
        interpret=interpret,
    )(bins)
    return hist.reshape(tiles * tiles, n_bins)


def _apply_kernel(bins_ref, wy_ref, vxt_ref, out_ref, *, n_bins: int,
                  t_rows: int):
    i = pl.program_id(0)
    bi = jnp.clip(i - 1, 0, t_rows - 3)  # first of the 3 candidate tile rows
    bins = bins_ref[:]  # (bh, W) int32
    w0 = wy_ref[:, 0:1]  # (bh, 1)
    w1 = wy_ref[:, 1:2]
    w2 = wy_ref[:, 2:3]

    def body(b, acc):
        v0 = vxt_ref[pl.ds(bi, 1), pl.ds(b, 1), :][0, 0]  # (W,)
        v1 = vxt_ref[pl.ds(bi + 1, 1), pl.ds(b, 1), :][0, 0]
        v2 = vxt_ref[pl.ds(bi + 2, 1), pl.ds(b, 1), :][0, 0]
        field = w0 * v0[None, :] + w1 * v1[None, :] + w2 * v2[None, :]
        return acc + jnp.where(bins == b, field, 0.0)

    out_ref[:] = jax.lax.fori_loop(
        0, n_bins, body, jnp.zeros(bins.shape, jnp.float32)
    )


@partial(jax.jit, static_argnames=("tiles", "n_bins", "interpret"))
def apply_lut(bins: jax.Array, wy3: jax.Array, vxt: jax.Array,
              tiles: int = 8, n_bins: int = 256,
              interpret: bool | None = None) -> jax.Array:
    """Bilinear tile-CDF application. bins (H, W) int32; wy3 (H, 3) per-row
    weights over tile rows {clip(i-1,0,T-3) + 0..2} of the row's block;
    vxt (tiles, n_bins, W) x-interpolated CDF rows. Returns (H, W) f32."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    H, W = bins.shape
    th = H // tiles
    return pl.pallas_call(
        partial(_apply_kernel, n_bins=n_bins, t_rows=tiles),
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((th, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((th, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            # whole table, constant across programs -> fetched once
            pl.BlockSpec((tiles, n_bins, W), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((th, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        interpret=interpret,
    )(bins, wy3, vxt)
