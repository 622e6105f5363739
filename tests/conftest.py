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

# Persistent compilation cache: warm re-runs of the suite skip most XLA
# compiles (measured ~2x on compile-heavy files; the box has ONE core, so
# compile time dominates the fast tier).
_cache_dir = os.environ.get(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    devs = jax.devices()
    assert devs[0].platform == "cpu", f"tests must run on CPU, got {devs}"
    return devs
