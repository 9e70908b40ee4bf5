"""Tracing/profiling helpers (SURVEY.md §5: the reference has only TicToc
wall timers with their prints disabled).

- `trace(path)`: context manager around `jax.profiler` (TensorBoard trace
  of device execution) — works on TPU; on constrained attachments it
  degrades to a no-op.
- `StageTimer`/`MetricsLogger` (in `utils.metrics`) provide the structured
  per-stage JSONL stream.
- `device_timer`: honest device timing on attachments where
  `block_until_ready` is a no-op (observed on the axon transport): the only
  reliable sync is a host readback, so the timer forces a tiny fetch.
"""

from __future__ import annotations

import contextlib
import time

import numpy as np
import jax


@contextlib.contextmanager
def trace(logdir: str):
    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception:
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


def hard_sync(tree) -> None:
    """Force completion of all pending work feeding `tree` via a host
    readback of one leaf (block_until_ready is unreliable on tunneled
    attachments)."""
    leaves = jax.tree.leaves(tree)
    if leaves:
        np.asarray(jax.numpy.ravel(leaves[0])[:1])


@contextlib.contextmanager
def device_timer(label: str, result_box: dict | None = None):
    t0 = time.perf_counter()
    holder = {}
    try:
        yield holder
    finally:
        if "out" in holder:
            hard_sync(holder["out"])
        dt = time.perf_counter() - t0
        if result_box is not None:
            result_box[label] = dt
