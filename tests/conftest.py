"""Test harness configuration.

All tests run on a virtual 8-device CPU mesh — the TPU answer to "test
multi-node without a cluster" (SURVEY.md §4 implications). The axon
sitecustomize force-registers the TPU tunnel and overrides JAX_PLATFORMS, so
we must both set the env vars AND reset jax's platform config after import.
Pallas kernels run with ``interpret=True`` here; on-chip correctness is
exercised by bench.py / examples on the real device.
"""

import os

os.environ["PALLAS_AXON_POOL_IPS"] = ""  # disable axon registration in subprocesses
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# sitecustomize may have force-set jax_platforms="axon,cpu" already
try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

# Persistent compilation cache: DISABLED by default (2026-08-19). It gave
# ~2x warm re-runs, but XLA:CPU AOT cache LOADS abort/segfault intermittently
# on this box — the loader logs "Target machine feature +prefer-no-scatter is
# not supported on the host machine ... could lead to execution errors such
# as SIGILL", and three suite runs died inside
# compilation_cache.get_executable_and_time at different tests (even with a
# freshly written cache). Opt back in with JAX_COMPILATION_CACHE_DIR if the
# host/jaxlib feature detection gets fixed.
_cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR")
if _cache_dir:
    try:
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

import pytest  # noqa: E402


_CLEAR_EVERY = int(os.environ.get("KOSMOSX_TEST_CLEAR_EVERY", "3"))
_modules_since_clear = [0]


@pytest.fixture(autouse=True, scope="module")
def _bound_compile_accumulation():
    """Free compiled executables every _CLEAR_EVERY module boundaries.

    The full fast tier accumulates ~190 XLA:CPU compiles in one process;
    at HEAD of round 3 that deterministically SIGSEGVed inside
    backend_compile_and_load (the ORC-JIT load step) two tests into
    test_serve_matrix — reproducibly at the same position, while the same
    file alone passes. Dropping executable references bounds the live
    JIT code regions. Round 4 cleared at EVERY module boundary, which
    fixed the segfault but ballooned the tier from ~8 to ~25 min
    (cross-module recompiles of the shared decoder/engine programs);
    clearing every 3rd module keeps live code bounded at ~3 modules'
    worth — far under the segfault threshold — while adjacent modules
    share compiles again (round-5 verdict item 7). Tune with
    KOSMOSX_TEST_CLEAR_EVERY (1 = round-4 behavior)."""
    yield
    _modules_since_clear[0] += 1
    if _modules_since_clear[0] >= _CLEAR_EVERY:
        _modules_since_clear[0] = 0
        jax.clear_caches()


@pytest.fixture(scope="session")
def devices():
    devs = jax.devices()
    assert devs[0].platform == "cpu", f"tests must run on CPU, got {devs}"
    return devs
