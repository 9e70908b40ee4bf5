"""Pallas TPU kernel: fused LOAM coefficient + Gauss-Newton row reduction.

The scan-to-map GN iteration's cost on TPU is NOT flops — it is the
serialized chain of ~95 small XLA kernels per iteration (corner line fit:
closed-form 3x3 eigensolve; surf plane fit: Sherman-Morrison in the
centered eigenbasis; robust weights; Jacobian rows; JtJ). Each op runs
microseconds of VPU work at (512..2048,) shapes but pays kernel latency.

This kernel runs the ENTIRE per-point pipeline for one feature class in a
single Pallas program, lane-per-point:

    inputs  (VMEM): pts block  (8, N)  [lidar xyz | valid | -]  (LOOP-
                    INVARIANT: the kernel applies the world transform
                    itself from the pose row, so the block is packed once
                    per scan, not once per iteration)
                    nbr block (24, N)  [5x neighbor xyz | 5x present | -]
                    (packed on correspondence refresh only)
                    par block  (8, 128) row 0: [R row-major | t]; rows
                    1-3: Ja/Jb/Jc (the d(Rp)/d(angle) matrices of
                    scan2map._euler_jac_mats) — the only per-iteration
                    input, 39 scalars
    output  (VMEM): (32, N) per-lane partials: rows 0-20 the upper
                    triangle of J^T J, 21-26 J^T b, 27 the valid count.

XLA reduces the partials over lanes (one fused reduce) and solves the 6x6
system exactly as before (`scan2map.gn_update` math). The math here is a
line-for-line port of `scan2map.corner_coeffs_nbrs` / `surf_coeffs_nbrs`
(`mapOptimization.cpp:1025-1167`) and `smallmat.sym3x3_eigvals` /
`sym3x3_max_eigvec` / `plane_fit` — floating-point parity up to the
reduction order of the final sums (tested against the XLA path in
tests/test_pallas_gn.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e10
_EPS = 1e-12


def _atan01(t):
    """atan(t) for t in [0, 1] — Cephes atanf polynomial with the pi/8
    range reduction (~1 ulp in f32). Mosaic has no atan/acos lowering."""
    big = t > 0.4142135623730950488  # tan(pi/8)
    t2 = jnp.where(big, (t - 1.0) / (t + 1.0), t)
    z = t2 * t2
    p = ((8.05374449538e-2 * z - 1.38776856032e-1) * z
         + 1.99777106478e-1) * z - 3.33329491539e-1
    a = p * z * t2 + t2
    return jnp.where(big, a + 0.7853981633974483, a)


def _acos(r):
    """acos(r) for r in [-1, 1] via atan2(sqrt(1-r^2), r) on the
    polynomial atan — branch-free, f32-accurate to ~1e-7."""
    y = jnp.sqrt(jnp.maximum(1.0 - r * r, 0.0))
    x = jnp.abs(r)
    z = y / jnp.maximum(x, 1e-30)
    inv = z > 1.0
    w = jnp.where(inv, 1.0 / jnp.maximum(z, 1e-30), z)
    a = _atan01(w)
    a = jnp.where(inv, jnp.pi / 2 - a, a)
    return jnp.where(r >= 0, a, jnp.pi - a)


def _eig3_sym(a00, a01, a02, a11, a12, a22):
    """smallmat.sym3x3_eigvals, lane-wise: descending eigenvalues of the
    symmetric matrix with the given unique entries."""
    p1 = a01 * a01 + a02 * a02 + a12 * a12
    q = (a00 + a11 + a22) / 3.0
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = b00 * b00 + b11 * b11 + b22 * b22 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, _EPS))
    detb = (
        b00 * (b11 * b22 - a12 * a12)
        - a01 * (a01 * b22 - a12 * a02)
        + a02 * (a01 * a12 - b11 * a02)
    )
    r = jnp.clip(detb / (2.0 * p * p * p), -1.0, 1.0)
    phi = _acos(r) / 3.0
    l1 = q + 2.0 * p * jnp.cos(phi)
    l3 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    l2 = 3.0 * q - l1 - l3
    iso = p2 < 1e-20
    l1 = jnp.where(iso, q, l1)
    l2 = jnp.where(iso, q, l2)
    l3 = jnp.where(iso, q, l3)
    return l1, l2, l3


def _max_eigvec(a00, a01, a02, a11, a12, a22, l2, l3):
    """smallmat.sym3x3_max_eigvec lane-wise: dominant column of the
    spectral projector M = (A - l2 I)(A - l3 I), argmax by column norm with
    first-max tie order (matches jnp.argmax)."""
    # B = A - l2 I, C = A - l3 I; M = B @ C (symmetric inputs, M not nec.)
    b00, b11, b22 = a00 - l2, a11 - l2, a22 - l2
    c00, c11, c22 = a00 - l3, a11 - l3, a22 - l3
    m00 = b00 * c00 + a01 * a01 + a02 * a02
    m10 = a01 * c00 + b11 * a01 + a12 * a02
    m20 = a02 * c00 + a12 * a01 + b22 * a02
    m01 = b00 * a01 + a01 * c11 + a02 * a12
    m11 = a01 * a01 + b11 * c11 + a12 * a12
    m21 = a02 * a01 + a12 * c11 + b22 * a12
    m02 = b00 * a02 + a01 * a12 + a02 * c22
    m12 = a01 * a02 + b11 * a12 + a12 * c22
    m22 = a02 * a02 + a12 * a12 + b22 * c22
    n0 = m00 * m00 + m10 * m10 + m20 * m20
    n1 = m01 * m01 + m11 * m11 + m21 * m21
    n2 = m02 * m02 + m12 * m12 + m22 * m22
    # column norms (not squared) decide in the XLA path; squares preserve
    # the order, so compare squares (sqrt is monotone)
    pick0 = (n0 >= n1) & (n0 >= n2)
    pick1 = (~pick0) & (n1 >= n2)
    vx = jnp.where(pick0, m00, jnp.where(pick1, m01, m02))
    vy = jnp.where(pick0, m10, jnp.where(pick1, m11, m12))
    vz = jnp.where(pick0, m20, jnp.where(pick1, m21, m22))
    nrm = jnp.sqrt(vx * vx + vy * vy + vz * vz)
    inv = 1.0 / jnp.maximum(nrm, _EPS)
    return vx * inv, vy * inv, vz * inv


def _accumulate(out_ref, row, b, ok):
    """Write per-lane GN partials: rows 0-20 upper-tri JtJ, 21-26 Jtb,
    27 count. `row` is a list of 6 (1, N) arrays, already weight-masked."""
    t = 0
    for a in range(6):
        for bb in range(a, 6):
            out_ref[t : t + 1, :] = row[a] * row[bb]
            t += 1
    for a in range(6):
        out_ref[21 + a : 22 + a, :] = row[a] * b
    out_ref[27:28, :] = ok.astype(jnp.float32)
    out_ref[28:32, :] = jnp.zeros_like(out_ref[28:32, :])


def _jac_rows(par_ref, nx, ny, nz, qx, qy, qz):
    """J rows: [n·(Ja q), n·(Jb q), n·(Jc q), nx, ny, nz] — the
    scan2map.gn_update assembly with the three 3x3 angle-derivative
    matrices read as scalars from the parameter block (rows 1-3 hold
    Ja, Jb, Jc column-major per row: par[1+r, 3*c + i] = J_r[i, c])."""
    rows = []
    for a in range(3):
        jp_x = (par_ref[1 + a, 0] * qx + par_ref[1 + a, 3] * qy
                + par_ref[1 + a, 6] * qz)
        jp_y = (par_ref[1 + a, 1] * qx + par_ref[1 + a, 4] * qy
                + par_ref[1 + a, 7] * qz)
        jp_z = (par_ref[1 + a, 2] * qx + par_ref[1 + a, 5] * qy
                + par_ref[1 + a, 8] * qz)
        rows.append(nx * jp_x + ny * jp_y + nz * jp_z)
    rows.extend([nx, ny, nz])
    return rows


def _world(par_ref, qx, qy, qz):
    """p_world = R q + t with R row-major + t in par row 0 lanes 0-11."""
    px = (par_ref[0, 0] * qx + par_ref[0, 1] * qy + par_ref[0, 2] * qz
          + par_ref[0, 9])
    py = (par_ref[0, 3] * qx + par_ref[0, 4] * qy + par_ref[0, 5] * qz
          + par_ref[0, 10])
    pz = (par_ref[0, 6] * qx + par_ref[0, 7] * qy + par_ref[0, 8] * qz
          + par_ref[0, 11])
    return px, py, pz


def _corner_kernel(pts_ref, nbr_ref, par_ref, out_ref):
    """Point-to-line coefficients + GN row partials (corner_coeffs_nbrs)."""
    qx, qy, qz = pts_ref[0:1, :], pts_ref[1:2, :], pts_ref[2:3, :]
    valid = pts_ref[3:4, :] > 0.5
    px, py, pz = _world(par_ref, qx, qy, qz)

    # neighbor distances + mean
    dmax = jnp.full_like(px, -_BIG)
    sx = jnp.zeros_like(px)
    sy = jnp.zeros_like(px)
    sz = jnp.zeros_like(px)
    for k in range(5):
        nxk = nbr_ref[3 * k : 3 * k + 1, :]
        nyk = nbr_ref[3 * k + 1 : 3 * k + 2, :]
        nzk = nbr_ref[3 * k + 2 : 3 * k + 3, :]
        hk = nbr_ref[15 + k : 16 + k, :] > 0.5
        dk = (nxk - px) ** 2 + (nyk - py) ** 2 + (nzk - pz) ** 2
        dmax = jnp.maximum(dmax, jnp.where(hk, dk, _BIG))
        sx = sx + nxk
        sy = sy + nyk
        sz = sz + nzk
    ok = valid & (dmax < 1.0)
    cx, cy, cz = sx / 5.0, sy / 5.0, sz / 5.0

    # covariance of the 5 neighbors (upper triangle), / 5
    a00 = jnp.zeros_like(px)
    a01 = jnp.zeros_like(px)
    a02 = jnp.zeros_like(px)
    a11 = jnp.zeros_like(px)
    a12 = jnp.zeros_like(px)
    a22 = jnp.zeros_like(px)
    for k in range(5):
        dx = nbr_ref[3 * k : 3 * k + 1, :] - cx
        dy = nbr_ref[3 * k + 1 : 3 * k + 2, :] - cy
        dz = nbr_ref[3 * k + 2 : 3 * k + 3, :] - cz
        a00 += dx * dx
        a01 += dx * dy
        a02 += dx * dz
        a11 += dy * dy
        a12 += dy * dz
        a22 += dz * dz
    a00, a01, a02 = a00 / 5.0, a01 / 5.0, a02 / 5.0
    a11, a12, a22 = a11 / 5.0, a12 / 5.0, a22 / 5.0

    l1, l2, l3 = _eig3_sym(a00, a01, a02, a11, a12, a22)
    ok &= l1 > 3.0 * l2
    ux, uy, uz = _max_eigvec(a00, a01, a02, a11, a12, a22, l2, l3)

    # point-to-line distance and unit gradient
    pcx, pcy, pcz = px - cx, py - cy, pz - cz
    crx = pcy * uz - pcz * uy
    cry = pcz * ux - pcx * uz
    crz = pcx * uy - pcy * ux
    d = jnp.sqrt(crx * crx + cry * cry + crz * crz)
    t = pcx * ux + pcy * uy + pcz * uz
    inv_d = 1.0 / jnp.maximum(d, 1e-9)
    nx = (pcx - t * ux) * inv_d
    ny = (pcy - t * uy) * inv_d
    nz = (pcz - t * uz) * inv_d
    s = 1.0 - 0.9 * jnp.abs(d)
    ok &= s > 0.1

    w = jnp.where(ok, s, 0.0)
    nx, ny, nz = w * nx, w * ny, w * nz
    b = -(w * d)
    rows = _jac_rows(par_ref, nx, ny, nz, qx, qy, qz)
    _accumulate(out_ref, rows, b, ok)


def _surf_kernel(pts_ref, nbr_ref, par_ref, out_ref):
    """Point-to-plane coefficients + GN row partials (surf_coeffs_nbrs,
    smallmat.plane_fit numerics)."""
    qx, qy, qz = pts_ref[0:1, :], pts_ref[1:2, :], pts_ref[2:3, :]
    valid = pts_ref[3:4, :] > 0.5
    px, py, pz = _world(par_ref, qx, qy, qz)

    dmax = jnp.full_like(px, -_BIG)
    allh = valid
    sx = jnp.zeros_like(px)
    sy = jnp.zeros_like(px)
    sz = jnp.zeros_like(px)
    for k in range(5):
        nxk = nbr_ref[3 * k : 3 * k + 1, :]
        nyk = nbr_ref[3 * k + 1 : 3 * k + 2, :]
        nzk = nbr_ref[3 * k + 2 : 3 * k + 3, :]
        hk = nbr_ref[15 + k : 16 + k, :] > 0.5
        dk = (nxk - px) ** 2 + (nyk - py) ** 2 + (nzk - pz) ** 2
        dmax = jnp.maximum(dmax, jnp.where(hk, dk, _BIG))
        allh &= hk
        sx = sx + nxk
        sy = sy + nyk
        sz = sz + nzk
    ok = allh & (dmax < 1.0)
    mx, my, mz = sx / 5.0, sy / 5.0, sz / 5.0

    # centered scatter S (NOT /5 — plane_fit uses the raw scatter)
    a00 = jnp.zeros_like(px)
    a01 = jnp.zeros_like(px)
    a02 = jnp.zeros_like(px)
    a11 = jnp.zeros_like(px)
    a12 = jnp.zeros_like(px)
    a22 = jnp.zeros_like(px)
    for k in range(5):
        dx = nbr_ref[3 * k : 3 * k + 1, :] - mx
        dy = nbr_ref[3 * k + 1 : 3 * k + 2, :] - my
        dz = nbr_ref[3 * k + 2 : 3 * k + 3, :] - mz
        a00 += dx * dx
        a01 += dx * dy
        a02 += dx * dz
        a11 += dy * dy
        a12 += dy * dz
        a22 += dz * dz

    l1, l2, l3 = _eig3_sym(a00, a01, a02, a11, a12, a22)
    v1x, v1y, v1z = _max_eigvec(a00, a01, a02, a11, a12, a22, l2, l3)
    # min-eigvec: roles of l1 and l3 swapped
    v3x, v3y, v3z = _max_eigvec(a00, a01, a02, a11, a12, a22, l2, l1)
    m1 = v1x * mx + v1y * my + v1z * mz
    m3 = v3x * mx + v3y * my + v3z * mz
    reg = 1e-8 + 1e-6 * l1
    w1 = 1.0 / (l1 + reg)
    w2 = 1.0 / (l2 + reg)
    w3 = 1.0 / (l3 + reg)
    rx = mx - m1 * v1x - m3 * v3x
    ry = my - m1 * v1y - m3 * v3y
    rz = mz - m1 * v1z - m3 * v3z
    bimx = w1 * m1 * v1x + w3 * m3 * v3x + w2 * rx
    bimy = w1 * m1 * v1y + w3 * m3 * v3y + w2 * ry
    bimz = w1 * m1 * v1z + w3 * m3 * v3z + w2 * rz
    sdot = mx * bimx + my * bimy + mz * bimz
    f = -5.0 / (1.0 + 5.0 * sdot)
    xx, xy, xz = f * bimx, f * bimy, f * bimz
    ps = jnp.sqrt(xx * xx + xy * xy + xz * xz)
    inv_ps = 1.0 / jnp.maximum(ps, _EPS)
    nx, ny, nz = xx * inv_ps, xy * inv_ps, xz * inv_ps
    d0 = inv_ps  # 1 / |x|, with the same max(_EPS) floor

    # planarity: every neighbor within 0.2 m of the plane
    for k in range(5):
        pe = jnp.abs(
            nbr_ref[3 * k : 3 * k + 1, :] * nx
            + nbr_ref[3 * k + 1 : 3 * k + 2, :] * ny
            + nbr_ref[3 * k + 2 : 3 * k + 3, :] * nz
            + d0
        )
        ok &= pe <= 0.2

    pd2 = px * nx + py * ny + pz * nz + d0
    rng = jnp.sqrt(qx * qx + qy * qy + qz * qz)
    s = 1.0 - 0.9 * jnp.abs(pd2) / jnp.sqrt(jnp.sqrt(jnp.maximum(rng, 1e-9)))
    ok &= s > 0.1

    w = jnp.where(ok, s, 0.0)
    nxw, nyw, nzw = w * nx, w * ny, w * nz
    b = -(w * pd2)
    rows = _jac_rows(par_ref, nxw, nyw, nzw, qx, qy, qz)
    _accumulate(out_ref, rows, b, ok)


def pack_pts(pts_lidar: jax.Array, pts_valid: jax.Array) -> jax.Array:
    """(8, N) pts block: rows 0-2 lidar xyz, 3 valid. Loop-invariant —
    build ONCE per scan (the kernel applies the world transform itself)."""
    N = pts_lidar.shape[0]
    return jnp.concatenate(
        [
            pts_lidar.T.astype(jnp.float32),
            pts_valid.astype(jnp.float32)[None, :],
            jnp.zeros((4, N), jnp.float32),
        ],
        axis=0,
    )


def pack_nbrs(nbrs: jax.Array, has: jax.Array) -> jax.Array:
    """(24, N) neighbor block: rows 0-14 the 5 neighbor xyz, 15-19 the
    present mask. Build on correspondence refresh only."""
    N = nbrs.shape[0]
    return jnp.concatenate(
        [
            nbrs.reshape(N, 15).T.astype(jnp.float32),
            has.astype(jnp.float32).T,
            jnp.zeros((4, N), jnp.float32),
        ],
        axis=0,
    )


def pack_pose(Rm: jax.Array, t: jax.Array, jacs: jax.Array) -> jax.Array:
    """(8, 128) per-iteration parameter block: row 0 = [R row-major (9),
    t (3)], rows 1-3 = Ja/Jb/Jc with lane 3c+i = J[i, c] (see _jac_rows)."""
    par = jnp.zeros((8, 128), jnp.float32)
    par = par.at[0, :9].set(Rm.reshape(9))
    par = par.at[0, 9:12].set(t)
    par = par.at[1:4, :9].set(jacs.transpose(0, 2, 1).reshape(3, 9))
    return par


@partial(jax.jit, static_argnames=("kind", "interpret"))
def gn_partials_packed(
    pts: jax.Array,  # (8, N) from pack_pts
    nbr: jax.Array,  # (24, N) from pack_nbrs
    par: jax.Array,  # (8, 128) from pack_pose
    kind: str,  # "corner" | "surf"
    interpret: bool = False,
):
    """Fused coefficients + GN row reduction for one feature class.
    Returns (H (6,6), g (6,), n_res () int32) — the same quantities
    `gn_update` assembles from `corner_coeffs`/`surf_coeffs` rows."""
    N = pts.shape[1]
    assert N % 128 == 0, "feature capacity must be lane-aligned"
    kernel = _corner_kernel if kind == "corner" else _surf_kernel
    out = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((8, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((24, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((32, N), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((32, N), jnp.float32),
        interpret=interpret,
    )(pts, nbr, par)

    part = jnp.sum(out, axis=1)  # (32,)
    iu = jnp.triu_indices(6)
    H = jnp.zeros((6, 6), jnp.float32).at[iu].set(part[:21])
    H = H + jnp.triu(H, 1).T
    g = part[21:27]
    n_res = part[27].astype(jnp.int32)
    return H, g, n_res


def gn_partials(
    pts_lidar: jax.Array,  # (N, 3) scan points, lidar frame
    pts_valid: jax.Array,  # (N,)
    nbrs: jax.Array,  # (N, 5, 3)
    has: jax.Array,  # (N, 5)
    Rm: jax.Array,  # (3, 3) lidar -> world rotation (pw = Rm q + t)
    t: jax.Array,  # (3,)
    jacs: jax.Array,  # (3, 3, 3) stacked [Ja, Jb, Jc] of _euler_jacobians
    kind: str,  # "corner" | "surf"
    interpret: bool = False,
):
    """Convenience wrapper over the packed form."""
    return gn_partials_packed(
        pack_pts(pts_lidar, pts_valid), pack_nbrs(nbrs, has),
        pack_pose(Rm, t, jacs), kind=kind, interpret=interpret,
    )
