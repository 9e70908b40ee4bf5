"""Closed-form small-matrix kernels.

TPU-native replacements for LAPACK-style batched routines that XLA lowers
to slow iterative loops: batched symmetric 3x3 eigendecomposition (the
corner-line fit, `mapOptimization.cpp:1049` cv::eigen) runs as branch-free
VPU arithmetic instead of a QR iteration (~400x faster at batch 1k+)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def sym3x3_eigvals(A: jax.Array):
    """Eigenvalues of symmetric (..., 3, 3), descending — trigonometric
    closed form (stable for PSD covariance matrices)."""
    a00, a11, a22 = A[..., 0, 0], A[..., 1, 1], A[..., 2, 2]
    a01, a02, a12 = A[..., 0, 1], A[..., 0, 2], A[..., 1, 2]
    p1 = a01 * a01 + a02 * a02 + a12 * a12
    q = (a00 + a11 + a22) / 3.0
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = b00 * b00 + b11 * b11 + b22 * b22 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, _EPS))
    # det(B)/2 where B = (A - qI)/p
    detb = (
        b00 * (b11 * b22 - a12 * a12)
        - a01 * (a01 * b22 - a12 * a02)
        + a02 * (a01 * a12 - b11 * a02)
    )
    r = jnp.clip(detb / (2.0 * p * p * p), -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    l1 = q + 2.0 * p * jnp.cos(phi)  # largest
    l3 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)  # smallest
    l2 = 3.0 * q - l1 - l3
    # degenerate (isotropic) case: all eigenvalues = q
    iso = p2 < 1e-20
    l1 = jnp.where(iso, q, l1)
    l2 = jnp.where(iso, q, l2)
    l3 = jnp.where(iso, q, l3)
    return l1, l2, l3


def sym3x3_max_eigvec(A: jax.Array, l1, l2, l3):
    """Unit eigenvector of the largest eigenvalue: the dominant column of
    the spectral projector (A - l2 I)(A - l3 I)."""
    eye = jnp.eye(3, dtype=A.dtype)
    M = (A - l2[..., None, None] * eye) @ (A - l3[..., None, None] * eye)
    norms = jnp.linalg.norm(M, axis=-2)  # column norms (..., 3)
    col = jnp.argmax(norms, axis=-1)
    v = jnp.take_along_axis(M, col[..., None, None], axis=-1)[..., 0]
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), _EPS)


def solve3x3(A: jax.Array, b: jax.Array) -> jax.Array:
    """Batched 3x3 solve via Cramer's rule (cross-product form)."""
    c0, c1, c2 = A[..., :, 0], A[..., :, 1], A[..., :, 2]
    cb = jnp.cross(c1, c2)
    det = jnp.sum(c0 * cb, axis=-1)
    inv_det = 1.0 / jnp.where(jnp.abs(det) > _EPS, det, jnp.inf)
    x0 = jnp.sum(b * cb, axis=-1) * inv_det
    x1 = jnp.sum(b * jnp.cross(c2, c0), axis=-1) * inv_det
    x2 = jnp.sum(b * jnp.cross(c0, c1), axis=-1) * inv_det
    return jnp.stack([x0, x1, x2], axis=-1)
