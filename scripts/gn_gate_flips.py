"""Measure per-point gate-flip disagreement between the Pallas fused GN
kernel and the XLA scan2map path (the source of pallas_gn's +12% LIO ATE,
NOTES r5), and whether unifying the acos implementation closes it.

The kernel's `_acos` is a Cephes polynomial (Mosaic has no acos lowering);
XLA's `jnp.arccos` is a different approximation. Eigenvalue deltas at
~1e-7 flip the near-threshold residual gates (l1 > 3*l2, s > 0.1,
dmax < 1) differently per point, changing the residual SET per solve.
This script counts mask flips on realistic neighborhoods, then
monkeypatches `smallmat.sym3x3_eigvals` with a polynomial-acos twin and
counts again — if corner flips go to ~0, gate-exactness is achievable by
sharing the acos; surf additionally differs through `plane_fit` (linear
solve) vs the kernel's eigenbasis route.

Usage: nohup python scripts/gn_gate_flips.py > /tmp/gn_flips.log &
"""

from __future__ import annotations

import os
import sys
from functools import partial

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    print("backend:", jax.default_backend(), flush=True)

    from lvislam_tpu.ops import pallas_gn, scan2map, smallmat
    from test_pallas_gn import _make_case, _pose

    N = 2048

    def pallas_mask(kind, pts, nbr, par):
        kernel = (pallas_gn._corner_kernel if kind == "corner"
                  else pallas_gn._surf_kernel)
        out = pl.pallas_call(
            kernel,
            grid=(1,),
            in_specs=[
                pl.BlockSpec((8, N), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((24, N), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((32, N), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((32, N), jnp.float32),
        )(pts, nbr, par)
        return out[27] > 0.5

    def xla_mask(kind, pw, pl_, valid, nbrs, has):
        if kind == "corner":
            co = scan2map.corner_coeffs_nbrs(
                jnp.asarray(pw), jnp.asarray(valid), jnp.asarray(nbrs),
                jnp.asarray(has))
        else:
            co = scan2map.surf_coeffs_nbrs(
                jnp.asarray(pw), jnp.asarray(pl_), jnp.asarray(valid),
                jnp.asarray(nbrs), jnp.asarray(has))
        return co.valid

    def run(tag):
        for kind in ("corner", "surf"):
            flips = total = 0
            for seed in range(8):
                rng = np.random.default_rng(seed)
                pw, pl_, valid, nbrs, has, x6 = _case(kind, rng)
                Rm, t = _pose(jnp.asarray(x6))
                jacs = scan2map._euler_jac_mats(jnp.asarray(x6))
                pts = pallas_gn.pack_pts(jnp.asarray(pl_),
                                         jnp.asarray(valid))
                nbrb = pallas_gn.pack_nbrs(jnp.asarray(nbrs),
                                           jnp.asarray(has))
                par = pallas_gn.pack_pose(Rm, t, jacs)
                mk = np.asarray(pallas_mask(kind, pts, nbrb, par))
                mx = np.asarray(xla_mask(kind, pw, pl_, valid, nbrs, has))
                flips += int((mk != mx).sum())
                total += int(mx.sum())
            print(f"{tag} {kind}: flips={flips} of ~{total} accepted "
                  f"({8 * N} points)", flush=True)

    def _case(kind, rng):
        out = _make_case(kind, rng, N=N)
        # test helper returns (pl_, pw, valid, nbrs, has, x6) — adapt if
        # its signature differs
        return out

    run("baseline")

    # ---- polynomial-acos twin of sym3x3_eigvals ----
    _EPS = 1e-12

    def _atan01(t):
        big = t > 0.4142135623730950488
        t2 = jnp.where(big, (t - 1.0) / (t + 1.0), t)
        z = t2 * t2
        p = ((8.05374449538e-2 * z - 1.38776856032e-1) * z
             + 1.99777106478e-1) * z - 3.33329491539e-1
        a = p * z * t2 + t2
        return jnp.where(big, a + 0.7853981633974483, a)

    def _acos(r):
        y = jnp.sqrt(jnp.maximum(1.0 - r * r, 0.0))
        x = jnp.abs(r)
        z = y / jnp.maximum(x, 1e-30)
        inv = z > 1.0
        w = jnp.where(inv, 1.0 / jnp.maximum(z, 1e-30), z)
        a = _atan01(w)
        a = jnp.where(inv, jnp.pi / 2 - a, a)
        return jnp.where(r >= 0, a, jnp.pi - a)

    def sym3x3_eigvals_poly(A):
        a00, a11, a22 = A[..., 0, 0], A[..., 1, 1], A[..., 2, 2]
        a01, a02, a12 = A[..., 0, 1], A[..., 0, 2], A[..., 1, 2]
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

    smallmat.sym3x3_eigvals = sym3x3_eigvals_poly
    jax.clear_caches()
    run("poly-acos")


if __name__ == "__main__":
    main()
