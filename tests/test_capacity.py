"""At-capacity behavior: the loop DB ring and the LIS keyframe saturation
guard (fixed-shape stores must not silently corrupt on long runs)."""

import numpy as np
import jax
import jax.numpy as jnp

from lvislam_tpu.models.lio import mapping
from lvislam_tpu.models.lio.frontend import FeatureResult
from lvislam_tpu.models.loop import loop_detector as ld
from lvislam_tpu.ops import brief


def _fake_entry(rng, caps):
    """Hand-rolled DB insert payloads (bypass image work: we only test the
    ring bookkeeping, which is independent of descriptor content)."""
    E, V = caps.extra_points, caps.vocab_words
    desc = jnp.asarray(rng.choice([-1.0, 1.0], (E, brief.N_BITS)), jnp.float32)
    return desc


def test_loop_db_ring_wraparound():
    caps = ld.LoopCaps(max_keyframes=8, window_points=8, extra_points=8,
                       vocab_words=32, recent_exclude=2, min_loop_matches=3)
    db = ld.db_init(caps)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (64, 64)), jnp.float32)
    uv = jnp.asarray(rng.uniform(20, 44, (caps.window_points, 2)), jnp.float32)
    norm = (uv - 32.0) / 100.0
    p3 = jnp.asarray(rng.normal(0, 1, (caps.window_points, 3)), jnp.float32)
    ok = jnp.ones(caps.window_points, bool)

    n_ins = 3 * caps.max_keyframes  # wrap the ring twice
    for i in range(n_ins):
        db, cand = ld.add_and_detect(
            db, img + i, uv, norm, p3, ok, jnp.float32(i * 0.1), caps,
            focal=100.0,
        )

    assert int(db.count) == n_ins
    seq = np.asarray(db.seq)
    # every slot holds one of the most recent N inserts, each exactly once
    expect = set(range(n_ins - caps.max_keyframes, n_ins))
    assert set(seq.tolist()) == expect
    # slot mapping is seq % N
    for s, q in enumerate(seq):
        assert q % caps.max_keyframes == s
    # stamps track the seq held by the slot
    np.testing.assert_allclose(np.asarray(db.stamps), seq * 0.1, atol=1e-5)


def test_loop_db_recency_exclusion_after_wrap():
    """After wraparound, only the most recent `recent_exclude` inserts are
    excluded — not everything (the old `idx < n - excl` mask went stale)."""
    caps = ld.LoopCaps(max_keyframes=8, window_points=8, extra_points=8,
                       vocab_words=32, recent_exclude=2, min_loop_matches=3)
    db = ld.db_init(caps)
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(0, 255, (64, 64)), jnp.float32)
    uv = jnp.asarray(rng.uniform(20, 44, (8, 2)), jnp.float32)
    norm = (uv - 32.0) / 100.0
    p3 = jnp.asarray(rng.normal(0, 1, (8, 3)), jnp.float32)
    ok = jnp.ones(8, bool)
    for i in range(20):
        db, _ = ld.add_and_detect(db, img + i, uv, norm, p3, ok,
                                  jnp.float32(i), caps, focal=100.0)
    n = int(db.count)
    eligible = (np.asarray(db.seq) >= 0) & (np.asarray(db.seq) < n - caps.recent_exclude)
    # ring holds 8 entries; 2 most recent excluded -> 6 eligible
    assert eligible.sum() == caps.max_keyframes - caps.recent_exclude


def _mk_feats(rng, caps):
    return FeatureResult(
        corner_xyz=jnp.asarray(rng.uniform(-8, 8, (caps.scan_corner, 3)), jnp.float32),
        corner_valid=jnp.ones(caps.scan_corner, bool),
        surf_xyz=jnp.asarray(rng.uniform(-8, 8, (caps.scan_surf, 3)), jnp.float32),
        surf_valid=jnp.ones(caps.scan_surf, bool),
        num_corner=jnp.int32(caps.scan_corner),
        num_surf=jnp.int32(caps.scan_surf),
    )


def test_lio_keyframes_saturate_at_capacity():
    caps = mapping.LioCaps(
        max_keyframes=4, kf_corner=64, kf_surf=256, sel_keyframes=4,
        map_corner=512, map_surf=2048, scan_corner=128, scan_surf=512,
        max_loops=2, max_gps=2, loop_submap=256, icp_iters=3,
        corner_hash_size=1 << 8, surf_hash_size=1 << 10, hash_bucket=8,
        surf_hash_bucket=8,
    )
    # force a keyframe every scan via the livox interval
    params = mapping.LioParams(livox_keyframe_interval=0.0,
                               surfFeatureMinValidNum=10)
    state = mapping.lio_init(caps)
    rng = np.random.default_rng(2)

    kept_kf0 = None
    for i in range(caps.max_keyframes + 3):
        scan = dict(
            stamp=jnp.float32(0.1 * (i + 1)),
            imu_available=jnp.array(False),
            imu_rpy_init=jnp.zeros(3),
            odom_available=jnp.array(False),
            odom_trans=jnp.zeros(3),
            odom_quat=jnp.array([1.0, 0, 0, 0]),
            odom_reset_id=jnp.int32(0),
        )
        state, out = mapping.map_step(state, scan, _mk_feats(rng, caps),
                                      caps, params)
        if int(state.kf_count) == caps.max_keyframes and kept_kf0 is None:
            kept_kf0 = np.asarray(state.kf_corner[caps.max_keyframes - 1])

    # count saturates; the last slot is not silently overwritten afterwards
    assert int(state.kf_count) == caps.max_keyframes
    np.testing.assert_array_equal(
        np.asarray(state.kf_corner[caps.max_keyframes - 1]), kept_kf0)
    # the post-capacity steps reported no keyframe
    assert not bool(out.is_keyframe)
