"""Voxel-hash gated kNN: must equal the exact kNN for every neighbor within
the 1 m acceptance gate."""

import numpy as np
import jax.numpy as jnp

from lvislam_tpu.ops import scan2map, voxel_hash as vh


def test_gated_knn_matches_exact(rng):
    M, Q = 5000, 512
    pts = rng.uniform(-5, 5, (M, 3)).astype(np.float32)
    valid = rng.random(M) > 0.05
    q = (pts[rng.integers(0, M, Q)] + rng.normal(0, 0.3, (Q, 3))).astype(np.float32)

    h = vh.build(jnp.asarray(pts), jnp.asarray(valid), 1.0, 1 << 14, 32)
    hi, hd = vh.query(h, jnp.asarray(q), 5)
    ei, ed = scan2map.knn(jnp.asarray(q), jnp.ones(Q, bool),
                          jnp.asarray(pts), jnp.asarray(valid), 5)
    hd, ed = np.asarray(hd), np.asarray(ed)
    hi, ei = np.asarray(hi), np.asarray(ei)
    # wherever the exact 5th neighbor is inside the gate, the hash result
    # must match (the scan-matcher only uses those). Reported distances are
    # f16-cell-relative approximations (<1 mm position error); the selected
    # neighbor SETS must agree and the exact recomputed distances must match
    gated = ed[:, 4] < 1.0
    assert gated.sum() > 200
    # >= 98% exact agreement; the remainder are 11-bit tag-collision
    # phantoms whose exact distances are recomputed (and gated out) in the
    # coefficient stage
    diff = np.abs(np.sort(hd, 1) - np.sort(ed, 1)).max(1)
    assert np.mean(diff[gated] < 5e-3) > 0.98, np.mean(diff[gated] < 5e-3)
    same = [set(hi[i]) == set(ei[i]) for i in np.nonzero(gated)[0]]
    assert np.mean(same) > 0.97, np.mean(same)
    # exact distances of the selected neighbors (what the coeff stage uses):
    # wherever the neighbor sets agree they must match the exact kNN
    sel_pts = pts[np.maximum(hi, 0)]
    d_recomp = ((sel_pts - q[:, None, :]) ** 2).sum(-1)
    agree = np.array(same) & True
    gi = np.nonzero(gated)[0][agree]
    np.testing.assert_allclose(
        np.sort(d_recomp[gi], 1), np.sort(ed[gi], 1), rtol=1e-4, atol=1e-5
    )


def test_empty_hash_returns_far():
    h = vh.build(jnp.zeros((64, 3)), jnp.zeros(64, bool), 1.0, 1 << 8, 8)
    idx, d = vh.query(h, jnp.zeros((4, 3)), 5)
    assert (np.asarray(d) > 1e9).all()
