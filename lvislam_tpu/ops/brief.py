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
    """(V, N_BITS) ±1 centroid descriptors — the flat stand-in for the DBoW2
    brief_k10L6 tree (capability: quantize + score; no training file)."""
    rng = np.random.default_rng(seed)
    return jnp.asarray(np.where(rng.random((n_words, N_BITS)) > 0.5, 1.0, -1.0),
                       dtype=jnp.float32)


def bow_vector(desc: jax.Array, valid: jax.Array, vocab: jax.Array) -> jax.Array:
    """Normalized word histogram of a descriptor set ((V,) float)."""
    sim = jax.lax.dot_general(
        desc, vocab.T, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (K, V)
    word = jnp.argmax(jnp.where(valid[:, None], sim, -jnp.inf), axis=1)
    V = vocab.shape[0]
    hist = jnp.zeros(V, jnp.float32).at[jnp.where(valid, word, V)].add(
        1.0, mode="drop"
    )
    return hist / jnp.maximum(jnp.sum(hist), 1.0)


def bow_scores(query: jax.Array, database: jax.Array) -> jax.Array:
    """L1 similarity of a query bag against all stored bags. For
    L1-normalized bags, DBoW2's 1 - 0.5*|q - d|_1 == sum(min(q, d)).
    query (V,), database (N, V) -> (N,)."""
    return jnp.sum(jnp.minimum(query[None, :], database), axis=1)
