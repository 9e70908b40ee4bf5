"""Binary descriptors, Hamming matching, and bag-of-words scoring.

TPU re-design of the pose_graph package's visual-loop machinery
(`pose_graph/src/ThirdParty/` DBoW2/DVision, `keyframe.cpp:37-110`,
`loop_detector.cpp:55-135`):

- BRIEF-256 descriptors (`computeBRIEFPoint`): intensity comparisons over a
  fixed 256-pair pattern in a smoothed patch. The reference loads a learned
  pattern file; here the pattern is a deterministic seeded draw from the
  same +-24 px disc — statistically equivalent. Descriptors are stored as
  +-1 vectors so EVERYTHING downstream is an MXU matmul:
  hamming(a, b) = (256 - a.b) / 2.
- descriptor matching (`searchByBRIEFDes`): full (K1, K2) similarity matmul
  + row argmax, gate at Hamming < 80.
- bag-of-words (DBoW2 BriefVocabulary/Database): a flat binary vocabulary
  of V random centroid descriptors; assignment = argmax similarity matmul;
  keyframe bag = tf-normalized histogram; database query = one
  (V,) x (V, N) matmul — the inverted-file walk becomes a dense GEMV.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import image as imops

N_BITS = 256
PATCH_HALF = 24


def brief_pattern(seed: int = 7) -> np.ndarray:
    """(N_BITS, 4) sampling pattern (x1, y1, x2, y2), gaussian around center
    (the DVision generator's distribution)."""
    rng = np.random.default_rng(seed)
    pat = np.clip(rng.normal(0, PATCH_HALF / 2.5, size=(N_BITS, 4)), -PATCH_HALF, PATCH_HALF)
    return pat.astype(np.float32)


_PATTERN = jnp.asarray(brief_pattern())


@partial(jax.jit, static_argnames=())
def describe(
    img: jax.Array,  # (H, W) float, ideally pre-blurred
    kps: jax.Array,  # (K, 2) keypoint pixel coords
    valid: jax.Array,  # (K,)
) -> jax.Array:
    """(K, N_BITS) descriptors in {-1, +1} (float32 for MXU matmuls)."""
    blur = imops._sep_conv(img, jnp.array([1.0, 4.0, 6.0, 4.0, 1.0], img.dtype) / 16.0)
    p1 = kps[:, None, :] + _PATTERN[None, :, 0:2]
    p2 = kps[:, None, :] + _PATTERN[None, :, 2:4]
    i1 = imops.bilinear_sample(blur, p1)
    i2 = imops.bilinear_sample(blur, p2)
    bits = jnp.where(i1 < i2, 1.0, -1.0)
    return jnp.where(valid[:, None], bits, 0.0)


def hamming_matmul(d1: jax.Array, d2: jax.Array) -> jax.Array:
    """(K1, K2) Hamming distances via one MXU matmul on ±1 descriptors."""
    sim = jax.lax.dot_general(
        d1, d2.T, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return (N_BITS - sim) / 2.0


def match(
    d1: jax.Array, v1: jax.Array, d2: jax.Array, v2: jax.Array,
    max_hamming: float = 80.0,
):
    """Best-match per row (`searchByBRIEFDes`, Hamming < 80). Returns
    (idx (K1,), ok (K1,))."""
    ham = hamming_matmul(d1, d2)
    ham = jnp.where(v2[None, :], ham, jnp.inf)
    idx = jnp.argmin(ham, axis=1)
    best = jnp.take_along_axis(ham, idx[:, None], axis=1)[:, 0]
    return idx.astype(jnp.int32), v1 & (best < max_hamming)


def make_vocabulary(n_words: int = 1024, seed: int = 11) -> jax.Array:
    """(V, N_BITS) ±1 centroid descriptors — the untrained fallback for the
    DBoW2 brief_k10L6 tree (capability: quantize + score). Real deployments
    should use `train_vocabulary` + `save_vocabulary` (the reference ships a
    TRAINED binary vocabulary, `pose_graph_node.cpp:297-314`)."""
    rng = np.random.default_rng(seed)
    return jnp.asarray(np.where(rng.random((n_words, N_BITS)) > 0.5, 1.0, -1.0),
                       dtype=jnp.float32)


def train_vocabulary(
    desc: np.ndarray,  # (N, N_BITS) ±1 training descriptors
    n_words: int = 1024,
    iters: int = 12,
    seed: int = 11,
    image_ids: np.ndarray | None = None,  # (N,) source image of each desc
) -> tuple[np.ndarray, np.ndarray]:
    """Binary k-means ("k-majority") vocabulary training — the flat
    equivalent of DBoW2's hierarchical-k-means `create`
    (`TemplatedVocabulary.h`, trained offline and shipped as brief_k10L6;
    loaded at `pose_graph_node.cpp:297-314`).

    Assignment is one (N, V) similarity matmul; the centroid update is the
    per-bit majority vote (the binary-domain mean). Empty clusters re-seed
    to the descriptors farthest from their centers (k-means++-style repair).

    Returns (vocab (V, N_BITS) ±1 float32, idf (V,) float32). The idf
    weights are DBoW2's TF_IDF word weights, log(N_images / N_i), computed
    from `image_ids` when given (ones otherwise)."""
    desc = np.asarray(desc, np.float32)
    N = desc.shape[0]
    rng = np.random.default_rng(seed)
    V = min(n_words, N)
    # k-means++ seeding on Hamming distance (random init collapses onto
    # dense clusters and majority updates cannot split them apart)
    centers = [desc[rng.integers(N)]]
    d2 = None
    for _ in range(V - 1):
        ham = (N_BITS - desc @ centers[-1]) / 2.0
        d2 = ham if d2 is None else np.minimum(d2, ham)
        p = d2 * d2
        s = p.sum()
        if s <= 0:
            centers.append(desc[rng.integers(N)])
            continue
        centers.append(desc[rng.choice(N, p=p / s)])
    C = np.stack(centers)
    for _ in range(iters):
        sim = desc @ C.T  # (N, V); hamming = (N_BITS - sim)/2
        a = np.argmax(sim, axis=1)
        onehot_sums = np.zeros((V, N_BITS), np.float32)
        np.add.at(onehot_sums, a, desc)
        counts = np.bincount(a, minlength=V)
        newC = np.where(onehot_sums >= 0.0, 1.0, -1.0).astype(np.float32)
        empty = counts == 0
        if empty.any():
            # farthest-from-assigned-center descriptors restart dead words
            best = sim[np.arange(N), a]
            far = np.argsort(best)[: int(empty.sum())]
            newC[empty] = desc[far]
        if np.array_equal(newC, C):
            C = newC
            break
        C = newC
    if n_words > V:  # fewer descriptors than words: pad with random words
        pad = np.asarray(make_vocabulary(n_words - V, seed=seed + 1))
        C = np.concatenate([C, pad], axis=0)
    idf = np.ones(n_words, np.float32)
    if image_ids is not None:
        image_ids = np.asarray(image_ids)
        a = np.argmax(desc @ C.T, axis=1)
        n_img = max(len(np.unique(image_ids)), 1)
        pairs = np.unique(np.stack([a, image_ids]), axis=1)
        ni = np.bincount(pairs[0], minlength=n_words).astype(np.float64)
        idf = np.log(n_img / np.maximum(ni, 1.0)).astype(np.float32)
        idf = np.maximum(idf, 1e-3)  # words seen in every image still count
    return C.astype(np.float32), idf


def save_vocabulary(path: str, vocab: np.ndarray, idf: np.ndarray) -> None:
    """Bit-packed vocabulary file (the reference's VocabularyBinary.cpp
    role): ±1 words stored as packed bits + f32 idf weights."""
    v = np.asarray(vocab)
    bits = np.packbits((v > 0).astype(np.uint8), axis=1)
    np.savez_compressed(path, bits=bits, n_bits=np.int32(v.shape[1]),
                        idf=np.asarray(idf, np.float32))


def load_vocabulary(path: str) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of `save_vocabulary` -> (vocab ±1 f32, idf f32)."""
    z = np.load(path)
    bits = np.unpackbits(z["bits"], axis=1)[:, : int(z["n_bits"])]
    vocab = np.where(bits > 0, 1.0, -1.0).astype(np.float32)
    return vocab, z["idf"].astype(np.float32)


def bow_vector(
    desc: jax.Array, valid: jax.Array, vocab: jax.Array,
    idf: jax.Array | None = None,
) -> jax.Array:
    """L1-normalized word histogram of a descriptor set ((V,) float).
    With `idf`, entries are tf·idf before normalization — DBoW2's TF_IDF
    weighting (`TemplatedVocabulary.h` transform)."""
    sim = jax.lax.dot_general(
        desc, vocab.T, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (K, V)
    word = jnp.argmax(jnp.where(valid[:, None], sim, -jnp.inf), axis=1)
    V = vocab.shape[0]
    hist = jnp.zeros(V, jnp.float32).at[jnp.where(valid, word, V)].add(
        1.0, mode="drop"
    )
    if idf is not None:
        hist = hist * idf
    return hist / jnp.maximum(jnp.sum(hist), 1e-9)


def bow_scores(query: jax.Array, database: jax.Array) -> jax.Array:
    """L1 similarity of a query bag against all stored bags. For
    L1-normalized bags, DBoW2's 1 - 0.5*|q - d|_1 == sum(min(q, d)).
    query (V,), database (N, V) -> (N,)."""
    return jnp.sum(jnp.minimum(query[None, :], database), axis=1)
