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


def plane_fit(nbrs: jax.Array, eps: float = 1e-8):
    """Batched regularized algebraic plane fit of (..., K, 3) neighborhoods:
    the exact minimizer of |A x + 1|² + eps|x|² (A = nbrs), returned as
    (n, d0) with n = x/|x|, d0 = 1/|x|, so n·p + d0 ≈ 0 — the reference's
    `A x = -1` parameterization (`mapOptimization.cpp:1118-1134`).

    Two numerical traps, both hit in round 2:

    * Solving the normal equations (AᵀA + eps I) x = Aᵀ(-1) directly in f32
      loses the normal direction: neighborhoods sit ~10-30 m from the
      origin with ~0.2-0.5 m spread, so kappa(AᵀA) ~ 1e4-1e10 (condition
      squared) — Cramer, LU and QR on AᵀA all fail (measured 4-16x ATE
      blowup on the LIO bench).
    * Swapping in an *accurate* total-least-squares fit is WORSE: for
      degenerate neighborhoods (quasi-collinear along a scan ring — most
      of a freshly-seeded one-scan map) the plane is underdetermined, TLS
      picks an arbitrary normal, and the regularized algebraic solution's
      min-norm behavior — the plane *facing the origin*, a line-of-sight
      surface prior that matches how the reference's solver degrades — is
      what actually stabilizes startup (measured: TLS 4x worse ATE even
      with an eigenvalue-ratio degeneracy gate).

    So: compute the SAME regularized algebraic solution, stably. Center
    the neighborhood (AᵀA = S + K m mᵀ, Aᵀ1 = K m with S the centered
    scatter), eigendecompose S in closed form (small, well-scaled — no
    cancellation), and apply Sherman-Morrison in the eigenbasis:

        x = -K B⁻¹ m / (1 + K mᵀ B⁻¹ m),   B = S + eps I.

    B⁻¹ needs only the extreme eigenvectors: P2 = I - P1 - P3, and
    whenever an extreme eigenvector is ill-determined its eigenvalue ties
    the neighbor's, so the weight split doesn't matter — branch-free and
    stable for every eigenvalue pattern."""
    K = nbrs.shape[-2]
    m = jnp.mean(nbrs, axis=-2)
    dev = nbrs - m[..., None, :]
    S = jnp.einsum("...ki,...kj->...ij", dev, dev)
    l1, l2, l3 = sym3x3_eigvals(S)
    v1 = sym3x3_max_eigvec(S, l1, l2, l3)
    # min-eigval eigenvector: spectral projector with the roles swapped
    v3 = sym3x3_max_eigvec(S, l3, l2, l1)
    m1 = jnp.sum(v1 * m, axis=-1, keepdims=True)
    m3 = jnp.sum(v3 * m, axis=-1, keepdims=True)
    # relative + absolute regularization: the f32 eigensolve carries
    # ~l1*1e-7 eigenvalue noise, so a fixed 1e-8 floor would split the
    # degenerate subspace's weights by rounding noise instead of evenly
    # (the even split IS the line-of-sight prior). 1e-6*l1 dominates the
    # noise while staying far below any genuine planar l3.
    reg = (eps + 1e-6 * l1)[..., None]
    w1 = 1.0 / (l1[..., None] + reg)
    w2 = 1.0 / (l2[..., None] + reg)
    w3 = 1.0 / (l3[..., None] + reg)
    bim = w1 * m1 * v1 + w3 * m3 * v3 + w2 * (m - m1 * v1 - m3 * v3)
    s = jnp.sum(m * bim, axis=-1, keepdims=True)
    x = -K * bim / (1.0 + K * s)
    ps = jnp.linalg.norm(x, axis=-1)
    n = x / jnp.maximum(ps, _EPS)[..., None]
    d0 = 1.0 / jnp.maximum(ps, _EPS)
    return n, d0


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
