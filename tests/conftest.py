"""Test configuration.

Forces an 8-device virtual CPU platform so multi-chip sharding paths
(jax.sharding.Mesh / shard_map) are exercised without TPU hardware. The
environment's 'axon' TPU plugin ignores JAX_PLATFORMS, so we additionally pin
jax_default_device to a CPU device — every un-committed computation then runs
on (fast-compiling) CPU; mesh tests pass explicit CPU device lists.
"""

import os

# XLA:CPU compile passes recurse deeply on the big fused programs; with the
# default 8 MB stack a full-suite run (hundreds of accumulated compiles)
# segfaulted inside backend_compile_and_load (observed twice, both in the
# late soak test). pthread stacks take the soft RLIMIT_STACK at thread
# creation, so raise it BEFORE jax spins up its compile pool.
try:
    import resource

    _soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
    _want = 256 << 20
    if _soft != resource.RLIM_INFINITY and _soft < _want:
        _new = _want if _hard == resource.RLIM_INFINITY else min(_want, _hard)
        resource.setrlimit(resource.RLIMIT_STACK, (_new, _hard))
except Exception:  # pragma: no cover
    pass

# Force, don't setdefault: the environment ships JAX_PLATFORMS=axon globally.
os.environ["JAX_PLATFORMS"] = "cpu"
# Persistent compile cache: repeat suite runs LOAD programs instead of
# re-running the XLA:CPU pass pipeline — that is both the big wall-time
# cost on this 1-core box and where the rare late-run SIGSEGV lives
# (inside backend_compile_and_load after hundreds of accumulated
# compiles). Fewer real compiles = fewer rolls of that die.
# NOT the shared jax_comp_cache: that one holds executables AOT-compiled
# by the axon remote-compile helper with host features this machine lacks
# (cpu_aot_loader warns SIGILL risk); the suite gets its own CPU-only dir.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache_cputests"
)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin registers itself from sitecustomize at interpreter
# start (before this file runs) and initializes ALL backends on first
# jax.devices() — a wedged/unavailable tunnel then fails or segfaults a
# test run that never needed the TPU (observed: SIGSEGV inside
# backend_compile_and_load with the tunnel down). Drop its factory before
# any backend initializes; tests are CPU-only by design.
try:  # pragma: no cover - depends on environment
    from jax._src import xla_bridge as _xb

    _xb._backend_factories.pop("axon", None)
    # sitecustomize imported jax before this file ran, so the jax_platforms
    # config was already baked from the env's JAX_PLATFORMS=axon; point it
    # at cpu or every backend init now fails on the unknown name.
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

try:
    _cpus = jax.devices("cpu")
    jax.config.update("jax_default_device", _cpus[0])
except RuntimeError:  # pragma: no cover
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def cpu_devices(n: int = 8):
    return jax.devices("cpu")[:n]


# Fast tier: `pytest -m smoke` finishes in ~2 min on the 1-core CI box
# (the full suite is ~20+ min of single-core XLA compiles). Modules here
# are compile-light; `slow`-marked tests are never smoke.
_SMOKE_MODULES = {
    "test_lie", "test_config", "test_bag", "test_chessboard",
    "test_voxel_hash", "test_pallas_knn", "test_scan2map", "test_native",
    "test_capacity", "test_gps",
}


def pytest_collection_modifyitems(config, items):
    for it in items:
        mod = getattr(it.module, "__name__", "")
        if mod in _SMOKE_MODULES and "slow" not in it.keywords:
            it.add_marker(pytest.mark.smoke)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop in-memory jit caches between modules. Accumulated live
    executables/LLVM code from ~100 compile-heavy tests are the prime
    suspect for the late-run SIGSEGV in backend_compile_and_load; modules
    rarely share traced programs, so the recompile cost is ~nil (and with
    the persistent cache above, re-lowering is a disk load anyway)."""
    yield
    import jax

    jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
