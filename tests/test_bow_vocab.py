"""Trained BoW vocabulary: k-majority training, tf-idf weighting, save/load,
and a retrieval precision test on aliased synthetic rooms that the seeded
random vocabulary demonstrably fails (VERDICT r2 missing #4; reference:
`pose_graph_node.cpp:297-314` loads a trained DBoW2 vocabulary)."""

import numpy as np
import jax.numpy as jnp
import pytest

from lvislam_tpu.ops import brief


def test_train_vocabulary_clusters_and_idf():
    rng = np.random.default_rng(0)
    # 4 well-separated binary prototypes + bit noise
    protos = np.where(rng.random((4, brief.N_BITS)) > 0.5, 1.0, -1.0)
    descs, ids = [], []
    for i in range(400):
        p = protos[i % 4].copy()
        flip = rng.random(brief.N_BITS) < 0.05
        p[flip] *= -1
        descs.append(p)
        ids.append(i % 8)  # 8 "images", each sees 2 prototypes... (i%4 vs i%8)
    desc = np.stack(descs).astype(np.float32)
    vocab, idf = brief.train_vocabulary(
        desc, n_words=4, iters=10, seed=3, image_ids=np.array(ids))
    # every trained word should sit within a few bits of one prototype
    ham = (brief.N_BITS - vocab @ protos.T) / 2
    assert (ham.min(axis=1) < 15).all(), ham.min(axis=1)
    # each prototype claimed by exactly one word
    assert len(set(ham.argmin(axis=1))) == 4
    assert idf.shape == (4,) and (idf > 0).all()


def test_vocabulary_save_load_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    desc = np.where(rng.random((300, brief.N_BITS)) > 0.5, 1.0, -1.0).astype(
        np.float32)
    vocab, idf = brief.train_vocabulary(desc, n_words=32, iters=4)
    p = str(tmp_path / "vocab.npz")
    brief.save_vocabulary(p, vocab, idf)
    v2, i2 = brief.load_vocabulary(p)
    np.testing.assert_array_equal(vocab, v2)
    np.testing.assert_allclose(idf, i2)


def _render_gallery(width=160, height=120, f=110.0):
    """Aliased rooms: same texture statistics, different layouts — 3 worlds
    x 8 poses. Returns (images, world_of, descs, valids)."""
    import jax

    from lvislam_tpu.ops import gftt
    from lvislam_tpu.utils import synthetic as syn

    images, world_of = [], []
    for seed in range(3):
        world = syn.default_world(seed=seed)
        traj = syn.circle_trajectory(radius=3.0, period=16.0)
        for k in range(8):
            t = 0.5 + 2.0 * k
            images.append(syn.render_camera_image(
                world, traj, t, width=width, height=height, f=f))
            world_of.append(seed)
    # queries: re-render 6 gallery poses slightly later (small view change)
    queries, q_true = [], []
    for qi in (1, 5, 9, 13, 17, 21):
        seed = qi // 8
        world = syn.default_world(seed=seed)
        traj = syn.circle_trajectory(radius=3.0, period=16.0)
        t = 0.5 + 2.0 * (qi % 8) + 0.12
        queries.append(syn.render_camera_image(
            world, traj, t, width=width, height=height, f=f))
        q_true.append(qi)

    @jax.jit
    def feats(im):
        kp, ok = gftt.detect(im, jnp.zeros((1, 2), im.dtype),
                             jnp.zeros(1, bool),
                             max_pts=64, cell=10, border=12)
        return brief.describe(im, kp, ok), ok

    g_desc, g_ok = zip(*(feats(jnp.asarray(im)) for im in images))
    q_desc, q_ok = zip(*(feats(jnp.asarray(im)) for im in queries))
    return (np.array(world_of), list(g_desc), list(g_ok),
            list(q_desc), list(q_ok), q_true)


def _retrieval_margin(vocab, idf, world_of, g_desc, g_ok, q_desc, q_ok,
                      q_true):
    """Mean (true-match score − best other-world score) and top-1 hits."""
    vocab = jnp.asarray(vocab)
    idf = jnp.asarray(idf)
    bags = jnp.stack([
        brief.bow_vector(d, v, vocab, idf=idf) for d, v in zip(g_desc, g_ok)
    ])
    margins, hits = [], 0
    for d, v, ti in zip(q_desc, q_ok, q_true):
        q = brief.bow_vector(d, v, vocab, idf=idf)
        s = np.asarray(brief.bow_scores(q, bags))
        other = s[world_of != world_of[ti]]
        margins.append(float(s[ti] - other.max()))
        hits += int(np.argmax(s) == ti)
    return float(np.mean(margins)), hits


@pytest.mark.slow
def test_trained_vocab_beats_random_on_aliased_rooms():
    world_of, g_desc, g_ok, q_desc, q_ok, q_true = _render_gallery()

    train = np.concatenate(
        [np.asarray(d)[np.asarray(v)] for d, v in zip(g_desc, g_ok)])
    ids = np.concatenate([
        np.full(int(np.asarray(v).sum()), i) for i, v in enumerate(g_ok)])
    vocab_t, idf_t = brief.train_vocabulary(
        train, n_words=128, iters=8, seed=5, image_ids=ids)

    vocab_r = np.asarray(brief.make_vocabulary(128))
    idf_r = np.ones(128, np.float32)

    m_t, hits_t = _retrieval_margin(
        vocab_t, idf_t, world_of, g_desc, g_ok, q_desc, q_ok, q_true)
    m_r, hits_r = _retrieval_margin(
        vocab_r, idf_r, world_of, g_desc, g_ok, q_desc, q_ok, q_true)

    # trained: every revisit retrieved from the right room with margin
    assert hits_t == len(q_true), (hits_t, m_t)
    assert m_t > 0.0, m_t
    # and demonstrably better separation than the random-projection vocab
    assert m_t > m_r + 0.01, (m_t, m_r)


@pytest.mark.smoke
def test_trained_vocab_is_the_product_default():
    """`LviConfig.vocab_path="auto"` loads the committed trained vocabulary
    (configs/brief_vocab.npz) in every LviSystem by default — the random
    projection vocab is reachable only by explicit opt-out (VERDICT r3 #7;
    reference loads its vocabulary at startup, pose_graph_node.cpp:297-314).
    """
    import sys as _sys

    _sys.path.insert(0, "tests")
    from test_lvi_system import make_system

    s = make_system()
    idf = np.asarray(s.loop_db.idf)
    assert not np.allclose(idf, idf[0]), "default LviSystem should carry the trained (non-uniform idf) vocab"

    # explicit opt-out returns the seeded random vocabulary
    import dataclasses as _dc

    from lvislam_tpu.models import pipeline as lvi

    s2 = lvi.LviSystem(_dc.replace(s.cfg, vocab_path=None))
    idf2 = np.asarray(s2.loop_db.idf)
    assert np.allclose(idf2, 1.0)
