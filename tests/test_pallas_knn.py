"""Fused Pallas query tail (`ops.pallas_knn`) must select bit-identically
to the XLA `voxel_hash.query` path (same scaled-domain op order)."""

import numpy as np
import jax.numpy as jnp

from lvislam_tpu.ops import voxel_hash as vh


def _parity(T, B, M=4096, Q=256, seed=0):
    rng = np.random.default_rng(seed)
    pts = jnp.asarray(rng.uniform(-10, 10, (M, 3)), jnp.float32)
    val = jnp.asarray(rng.random(M) > 0.1)
    h = vh.build(pts, val, 1.0, T, B)
    q = jnp.asarray(
        (pts[rng.integers(0, M, Q)] + rng.normal(0, 0.4, (Q, 3))), jnp.float32
    )
    i1, d1 = vh.query(h, q, 5)
    i2, d2 = vh.query_fused(h, q, 5, interpret=True)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-6)


def test_fused_query_parity_b16():
    _parity(1 << 12, 16)


def test_fused_query_parity_b32():
    _parity(1 << 11, 32, seed=1)


def test_fused_query_padding_path():
    # Q not a multiple of the kernel block exercises the pad lanes; queries
    # far from any point exercise the <k-candidates -1 fallback
    rng = np.random.default_rng(2)
    pts = jnp.asarray(rng.uniform(-5, 5, (512, 3)), jnp.float32)
    h = vh.build(pts, jnp.ones(512, bool), 1.0, 1 << 10, 16)
    q = jnp.asarray(
        np.concatenate([rng.uniform(-5, 5, (30, 3)),
                        np.full((3, 3), 50.0)]), jnp.float32
    )
    i1, d1 = vh.query(h, q, 5)
    i2, d2 = vh.query_fused(h, q, 5, interpret=True)
    # far queries: both report no neighbors
    assert (np.asarray(d1)[30:] > 1e9).all()
    assert (np.asarray(d2)[30:] > 1e9).all()
    np.testing.assert_array_equal(np.asarray(i1)[:30], np.asarray(i2)[:30])
    np.testing.assert_allclose(
        np.asarray(d1)[:30], np.asarray(d2)[:30], rtol=1e-6
    )
