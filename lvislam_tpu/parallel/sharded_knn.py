"""Map-sharded exact kNN: the multi-chip version of `ops.scan2map.knn`.

The global map is sharded along the point dimension over the mesh's ``map``
axis; each device computes the top-k against its shard (local MXU distance
matmuls), then the per-device candidate sets are combined with an
``all_gather`` over ICI and merged with one more top-k. Queries are
replicated along ``map``. Communication: k·Q floats per device — tiny next
to the local compute, so this scales ~linearly until the shard no longer
amortizes the collective.
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

from ..ops.scan2map import knn as local_knn


def sharded_knn(mesh: Mesh, k: int = 5, chunk: int = 4096):
    """Returns a function (query (Q,3), query_valid, map_pts (M,3),
    map_valid) -> (idx (Q,k) GLOBAL indices, sqdist (Q,k)), with map_pts
    sharded over the 'map' mesh axis."""

    n_map = mesh.shape["map"]

    def fn(query, query_valid, map_pts, map_valid):
        def local(q, qv, m, mv):
            # m: (M/n_map, 3) local shard
            shard = jax.lax.axis_index("map")
            m_local = m.shape[0]
            idx, d = local_knn(q, qv, m, mv, k=k, chunk=min(chunk, m.shape[0]))
            idx = idx + shard * m_local  # globalize indices
            # gather all shards' candidates: (n_map, Q, k)
            all_d = jax.lax.all_gather(d, "map")
            all_i = jax.lax.all_gather(idx, "map")
            Q = q.shape[0]
            cat_d = jnp.moveaxis(all_d, 0, 1).reshape(Q, n_map * k)
            cat_i = jnp.moveaxis(all_i, 0, 1).reshape(Q, n_map * k)
            nd, sel = jax.lax.top_k(-cat_d, k)
            return jnp.take_along_axis(cat_i, sel, axis=1), -nd

        import inspect

        kwargs = {}
        params = inspect.signature(shard_map).parameters
        if "check_rep" in params:
            kwargs["check_rep"] = False
        elif "check_vma" in params:
            kwargs["check_vma"] = False
        return shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), P(), P("map"), P("map")),
            out_specs=(P(), P()),
            **kwargs,
        )(query, query_valid, map_pts, map_valid)

    return fn
