"""Batched multi-sequence replay: SPMD data-parallel LIO.

The reference processes one robot's stream in real time; at TPU scale the
framework also serves *fleets* — N independent sequences (multi-robot logs,
parameter sweeps, monte-carlo robustness runs) stepped in lockstep, one
`vmap`'d `map_step` per scan with the batch axis sharded over the mesh's
``batch`` axis. State never leaves the device between scans.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.lio import mapping
from ..models.lio.frontend import FeatureResult


def batched_lio_init(caps: mapping.LioCaps, batch: int, mesh: Mesh | None = None):
    state = mapping.lio_init(caps)
    bstate = jax.tree.map(lambda x: jnp.broadcast_to(x[None], (batch,) + x.shape), state)
    if mesh is not None:
        sh = NamedSharding(mesh, P("batch"))
        bstate = jax.tree.map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P(*( ("batch",) + (None,) * (x.ndim - 1))))),
            bstate,
        )
    return bstate


def make_batched_step(caps: mapping.LioCaps, params: mapping.LioParams, mesh: Mesh | None = None):
    """Returns jitted fn (batched_state, batched_scan, batched_feats) ->
    (batched_state, batched_outputs), sharded over `batch`.

    With a mesh, every input and output is constrained to the mesh's
    ``batch`` axis via ``with_sharding_constraint`` — callers need not
    pre-place state (though doing so avoids an initial reshard)."""

    def step(state, scan, feats):
        return mapping.map_step(state, scan, feats, caps, params)

    vstep = jax.vmap(step)
    if mesh is None:
        return jax.jit(vstep)

    def shard_spec(x):
        return NamedSharding(mesh, P(*(("batch",) + (None,) * (max(x.ndim, 1) - 1))))

    def constrain(tree):
        return jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, shard_spec(x)) if x.ndim >= 1 else x,
            tree,
        )

    def sharded_step(state, scan, feats):
        state, scan, feats = constrain((state, scan, feats))
        new_state, out = vstep(state, scan, feats)
        return constrain(new_state), constrain(out)

    return jax.jit(sharded_step)


def make_batched_loop_step(caps: mapping.LioCaps, params: mapping.LioParams):
    def step(state):
        return mapping.loop_closure_step(state, caps, params)

    return jax.jit(jax.vmap(step))
