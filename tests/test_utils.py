"""Utility-layer coverage: pytree helpers, debug guards, profiling hooks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kosmosx_tpu.utils.debug import assert_finite, checked
from kosmosx_tpu.utils.profiling import StepTimer, compiled_flops
from kosmosx_tpu.utils.pytree import param_bytes, param_count, tree_paths


def test_param_count_and_bytes():
    tree = {"a": jnp.ones((3, 4)), "b": {"c": jnp.ones((5,), jnp.bfloat16)}}
    assert param_count(tree) == 17
    assert param_bytes(tree) == 12 * 4 + 5 * 2


def test_tree_paths():
    tree = {"a": jnp.ones(2), "b": {"c": jnp.ones(2)}}
    paths = [str(p) for p in tree_paths(tree)]
    assert any("a" in p for p in paths)
    assert any("b" in p and "c" in p for p in paths)


def test_compiled_flops_counts_matmul(devices):
    f = lambda x: x @ x
    flops = compiled_flops(f, jnp.ones((64, 64)))
    if flops is not None:  # cost analysis availability is backend-dependent
        assert flops >= 2 * 64 * 64 * 64 * 0.5


def test_assert_finite_raises_on_nan(devices):
    ok = {"w": jnp.ones(3)}
    assert_finite(ok)  # no raise
    bad = {"w": jnp.array([1.0, float("nan"), 2.0])}
    with pytest.raises(Exception):
        assert_finite(bad)


def test_step_timer(devices):
    timer = StepTimer()
    _ = float(jnp.sum(jnp.ones((8, 8)) @ jnp.ones((8, 8))))
    timer.step(tokens=64)
    assert timer.elapsed > 0
    s = timer.summary()
    assert s["steps_per_sec"] > 0 and s["tokens_per_sec"] > 0
