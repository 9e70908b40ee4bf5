"""Visual loop detection — the pose_graph package equivalent
(`pose_graph/src/pose_graph_node.cpp`, `loop_detector.cpp`, `keyframe.cpp`).

Pipeline per keyframe (the reference's `LoopDetector::addKeyFrame`):

1. keypoints: the marginalized window points (`point_2d_uv`) plus extra
   corners (the reference uses FAST-20; here Shi-Tomasi grid detection —
   same role, `keyframe.cpp:37-73`);
2. BRIEF descriptors for both sets (`ops.brief.describe`);
3. BoW query against the database excluding the most recent 200 frames
   (`loop_detector.cpp:67`), accept when top-score > 0.05 with a second
   candidate > 0.015 (`:99-123`), earliest qualifying index wins;
4. geometric verification (`KeyFrame::findConnection`, `keyframe.cpp:
   179-263`): Hamming-<80 descriptor matching of the current window points
   against the OLD frame's keypoints, then PnP RANSAC on (old 2D, cur 3D)
   with > MIN_LOOP_NUM=25 inliers;
5. on success, the (cur, old) pair + relative pose is handed to the LIS
   factor graph — the repaired `match_frame` channel (the reference wires
   `/vins/pose_graph/match_frame` to a subscriber that listens on
   `/vins/loop/match_frame` and never receives it; SURVEY.md §3.4).

The database is a fixed-capacity pytree; every stage is one jitted call.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...ops import brief, gftt, ransac


@dataclasses.dataclass(frozen=True)
class LoopCaps:
    max_keyframes: int = 1024
    window_points: int = 150  # tracked-feature keypoints per keyframe
    extra_points: int = 256  # FAST/Shi-Tomasi keypoints per keyframe
    vocab_words: int = 1024
    recent_exclude: int = 200  # frames excluded from query (`loop_detector.cpp:67`)
    min_loop_matches: int = 25  # MIN_LOOP_NUM (`keyframe.h:16`)


class LoopDB(NamedTuple):
    """Fixed-capacity RING buffer: slot = insert_seq % N. `seq` records each
    slot's global insert number (-1 = never written), so recency exclusion
    stays correct after wraparound — at capacity the oldest entry is evicted
    (the reference's DBoW2 database grows unboundedly; a ring bounds memory
    while keeping the most recent N keyframes queryable)."""

    bags: jax.Array  # (N, V) BoW vectors
    kp_desc: jax.Array  # (N, E, 256) extra-keypoint descriptors (±1)
    kp_valid: jax.Array  # (N, E)
    kp_norm: jax.Array  # (N, E, 2) normalized coords of extra keypoints
    stamps: jax.Array  # (N,)
    count: jax.Array  # () total inserts ever (not clamped to N)
    seq: jax.Array  # (N,) int32 insert number held by each slot, -1 if empty
    vocab: jax.Array  # (V, 256)
    idf: jax.Array  # (V,) tf-idf word weights (ones for untrained vocab)


def db_init(caps: LoopCaps, dtype=jnp.float32, vocab=None, idf=None) -> LoopDB:
    """`vocab`/`idf` from `brief.train_vocabulary`/`load_vocabulary` — the
    reference loads its trained binary vocabulary the same way
    (`pose_graph_node.cpp:297-314`); defaults fall back to the seeded
    random vocabulary with uniform weights."""
    N, E, V = caps.max_keyframes, caps.extra_points, caps.vocab_words
    if vocab is None:
        vocab = brief.make_vocabulary(V)
    if idf is None:
        idf = jnp.ones(V, dtype)
    return LoopDB(
        bags=jnp.zeros((N, V), dtype),
        kp_desc=jnp.zeros((N, E, brief.N_BITS), dtype),
        kp_valid=jnp.zeros((N, E), bool),
        kp_norm=jnp.zeros((N, E, 2), dtype),
        stamps=jnp.zeros(N, dtype),
        count=jnp.int32(0),
        seq=jnp.full(N, -1, jnp.int32),
        vocab=jnp.asarray(vocab, dtype),
        idf=jnp.asarray(idf, dtype),
    )


class LoopCandidate(NamedTuple):
    found: jax.Array  # ()
    old_index: jax.Array  # () keyframe index in the DB
    cur_index: jax.Array  # ()
    rel_trans: jax.Array  # (3,) old_cam <- cur frame PnP pose
    rel_quat: jax.Array  # (4,)
    n_matches: jax.Array  # ()
    best_score: jax.Array  # ()


@partial(jax.jit, static_argnames=("caps",))
def add_and_detect(
    db: LoopDB,
    image: jax.Array,  # (H, W)
    win_uv: jax.Array,  # (Wp, 2) tracked window points (pixels)
    win_norm: jax.Array,  # (Wp, 2) their normalized coords
    win_pts3d: jax.Array,  # (Wp, 3) triangulated world points (cur VIO frame)
    win_valid: jax.Array,  # (Wp,)
    stamp: jax.Array,
    caps: LoopCaps,
    focal: jax.Array | float = 460.0,
    center: jax.Array | None = None,
) -> tuple[LoopDB, LoopCandidate]:
    """`addKeyFrame` (query first, then insert — `loop_detector.cpp:12-53`)."""
    # extra keypoints + descriptors for the database entry — dense coverage
    # like the reference's FAST pass (no exclusion around window points:
    # future queries must be able to match their window points HERE)
    kp, kp_ok = gftt.detect(
        image, jnp.zeros((1, 2), image.dtype), jnp.zeros(1, bool),
        max_pts=caps.extra_points, cell=12, border=16,
    )
    kp_desc = brief.describe(image, kp, kp_ok)
    H, W = image.shape
    # normalized coords of the detected keypoints (the DB stores the old
    # frame's 2D observations for PnP verification)
    c = jnp.array([W / 2.0, H / 2.0]) if center is None else center
    kp_norm = (kp - c) / focal

    win_desc = brief.describe(image, win_uv, win_valid)
    all_desc = jnp.concatenate([win_desc, kp_desc], axis=0)
    all_valid = jnp.concatenate([win_valid, kp_ok], axis=0)
    bag = brief.bow_vector(all_desc, all_valid, db.vocab, idf=db.idf)

    # ---- query (excluding recent frames; ring-aware via per-slot seq) ----
    n = db.count
    scores = brief.bow_scores(bag, db.bags)
    eligible = (db.seq >= 0) & (db.seq < n - caps.recent_exclude)
    scores = jnp.where(eligible, scores, -1.0)
    top4, top_idx = jax.lax.top_k(scores, 4)
    # accept: best > 0.05 and at least one other > 0.015 (`:99-123`)
    good = (top4[0] > 0.05) & jnp.any(top4[1:] > 0.015)
    # earliest qualifying frame among candidates above 0.015 — chronological
    # order is the per-slot seq, not the slot index (ring wraparound)
    qual_seq = jnp.where(top4 > 0.015, db.seq[top_idx], jnp.int32(2**30))
    old_idx = top_idx[jnp.argmin(qual_seq)]
    has_cand = good & jnp.any(top4 > 0.015)

    # ---- geometric verification vs the old keyframe ----
    def verify(_):
        old_desc = db.kp_desc[old_idx]
        old_ok = db.kp_valid[old_idx]
        old_norm = db.kp_norm[old_idx]
        midx, mok = brief.match(win_desc, win_valid, old_desc, old_ok)
        matched_old = old_norm[midx]
        n_match = jnp.sum(mok)
        res = ransac.pnp_ransac(
            win_pts3d, matched_old, mok,
            threshold=10.0 / focal, n_hyp=128,
        )
        ok = (n_match > caps.min_loop_matches) & (
            res.n_inliers > caps.min_loop_matches
        )
        return LoopCandidate(
            found=ok, old_index=old_idx, cur_index=n,
            rel_trans=res.trans, rel_quat=res.quat,
            n_matches=res.n_inliers, best_score=top4[0],
        )

    def no(_):
        return LoopCandidate(
            found=jnp.array(False), old_index=jnp.int32(-1), cur_index=n,
            rel_trans=jnp.zeros(3), rel_quat=jnp.array([1.0, 0, 0, 0]),
            n_matches=jnp.int32(0), best_score=top4[0],
        )

    cand = jax.lax.cond(has_cand, verify, no, None)

    # ---- insert into DB (add AFTER query, `loop_detector.cpp:46`);
    # ring slot: at capacity the oldest entry is evicted ----
    k = n % caps.max_keyframes
    db = db._replace(
        bags=db.bags.at[k].set(bag),
        kp_desc=db.kp_desc.at[k].set(kp_desc),
        kp_valid=db.kp_valid.at[k].set(kp_ok),
        kp_norm=db.kp_norm.at[k].set(kp_norm),
        stamps=db.stamps.at[k].set(stamp),
        count=n + 1,
        seq=db.seq.at[k].set(n),
    )
    return db, cand
