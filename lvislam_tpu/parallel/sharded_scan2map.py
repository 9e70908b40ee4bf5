"""Map-sharded scan-to-map GN: the multi-chip product form of
`ops.scan2map.scan_to_map` (`scan2MapOptimization`,
`mapOptimization.cpp:1315-1343`).

The local map's corner/surf point sets are sharded along the point
dimension over the mesh's ``map`` axis; the scan (a few thousand points)
and the 6-DoF state are replicated. Each GN iteration:

1. every device runs the exact blocked-matmul 5-NN against ITS shard
   (`ops.scan2map.knn` — an MXU distance matmul fused into `top_k`);
2. the per-shard candidates ship as COORDINATES (not indices) with their
   distances — `all_gather` over ICI of (Q, 5, 3)+(Q, 5) per device, tiny
   next to the local matmul — and one more `top_k` merges them into the
   exact global 5-NN neighborhoods;
3. the coefficient + Gauss-Newton stage (`corner_coeffs_nbrs` /
   `surf_coeffs_nbrs` / `gn_update`) runs on the merged, replicated
   neighborhoods — 6x6 algebra, redundant per device by design.

Shipping coordinates instead of indices is what makes the merge local:
the global-best neighbors of a query may live on different shards, and
gathering rows after an index merge would need a second collective.

Exactness: identical correspondences and updates to the single-device
`scan_to_map` (parity-tested in tests/test_sharded_scan2map.py) — the
merge is over exact per-shard top-5 sets, so the global top-5 is exact.

Scaling: local kNN cost drops as 1/n_map (it is the dominant O(Q·M)
term); the collective moves n_map·Q·5·4 floats per class per iteration,
which rides ICI and stays ~constant per device.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.7 public API
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..core import lie
from ..ops.scan2map import (
    Coeffs,
    GNState,
    corner_coeffs_nbrs,
    gn_update,
    knn as local_knn,
    surf_coeffs_nbrs,
)


def _shard_nn_coords(q, m_pts, m_valid, k, axis="map"):
    """Exact global k-NN neighborhoods of replicated queries against a
    sharded map, returned as merged COORDINATES: (Q, k, 3), present-mask
    (Q, k), inside a shard_map body."""
    n_map = jax.lax.axis_size(axis)
    idx, d = local_knn(q, jnp.ones(q.shape[0], bool), m_pts, m_valid, k=k)
    nb = m_pts[jnp.maximum(idx, 0)]  # (Q, k, 3) shard-local rows
    # invalid refs carry d >= _BIG (1e10) from local_knn's masking: d is
    # both the merge key and the presence signal
    all_d = jax.lax.all_gather(d, axis)  # (n_map, Q, k)
    all_nb = jax.lax.all_gather(nb, axis)  # (n_map, Q, k, 3)
    Q = q.shape[0]
    cat_d = jnp.moveaxis(all_d, 0, 1).reshape(Q, n_map * k)
    cat_nb = jnp.moveaxis(all_nb, 0, 1).reshape(Q, n_map * k, 3)
    nd, sel = jax.lax.top_k(-cat_d, k)
    merged_nb = jnp.take_along_axis(cat_nb, sel[..., None], axis=1)
    has = -nd < 1e9  # below the _BIG invalid-ref sentinel
    return merged_nb, has


def sharded_scan_to_map(mesh: Mesh, max_iters: int = 20,
                        eigen_thresh: float = 100.0):
    """Build the map-sharded GN solver over `mesh` (needs a 'map' axis).

    Returns fn(x6_init, corner_pts, corner_valid, surf_pts, surf_valid,
    map_corner, map_corner_valid, map_surf, map_surf_valid) -> GNState,
    where the four map arrays are sharded P('map') and everything else is
    replicated. Semantics match `ops.scan2map.scan_to_map`.
    """

    def local(x6_init, cp, cv, sp, sv, mc, mcv, ms, msv):
        def cond(st: GNState):
            return (st.it < max_iters) & (~st.converged)

        def body(st: GNState):
            t = st.x6[3:6]
            Rm = lie.ypr_to_matrix(
                jnp.stack([st.x6[2], st.x6[1], st.x6[0]]) * (180.0 / jnp.pi)
            )
            cw = cp @ Rm.T + t
            sw = sp @ Rm.T + t
            c_nb, c_has = _shard_nn_coords(cw, mc, mcv, 5)
            s_nb, s_has = _shard_nn_coords(sw, ms, msv, 5)
            cc = corner_coeffs_nbrs(cw, cv, c_nb, c_has)
            sc = surf_coeffs_nbrs(sw, sp, sv, s_nb, s_has)
            coeffs = Coeffs(
                normal=jnp.concatenate([cc.normal, sc.normal]),
                offset=jnp.concatenate([cc.offset, sc.offset]),
                valid=jnp.concatenate([cc.valid, sc.valid]),
            )
            pts = jnp.concatenate([cp, sp])
            new_x, conv, proj, degen, n_res = gn_update(
                st.x6, pts, coeffs, st.it == 0, st.proj, st.degenerate,
                eigen_thresh=eigen_thresh,
            )
            return GNState(x6=new_x, it=st.it + 1, converged=conv,
                           degenerate=degen, proj=proj, num_residuals=n_res)

        init = GNState(
            x6=x6_init, it=jnp.int32(0), converged=jnp.array(False),
            degenerate=jnp.array(False),
            proj=jnp.eye(6, dtype=x6_init.dtype),
            num_residuals=jnp.int32(0),
        )
        return jax.lax.while_loop(cond, body, init)

    import inspect

    kwargs = {}
    params = inspect.signature(shard_map).parameters
    if "check_rep" in params:
        kwargs["check_rep"] = False
    elif "check_vma" in params:
        kwargs["check_vma"] = False

    sharded = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(),
                  P("map"), P("map"), P("map"), P("map")),
        out_specs=GNState(x6=P(), it=P(), converged=P(), degenerate=P(),
                          proj=P(), num_residuals=P()),
        **kwargs,
    )

    @partial(jax.jit)
    def fn(x6_init, corner_pts, corner_valid, surf_pts, surf_valid,
           map_corner, map_corner_valid, map_surf, map_surf_valid):
        return sharded(x6_init, corner_pts, corner_valid, surf_pts,
                       surf_valid, map_corner, map_corner_valid,
                       map_surf, map_surf_valid)

    return fn
