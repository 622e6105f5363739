"""ops/fast_gelu: exhaustive bf16-domain accuracy vs the exact erf-gelu.

The claim in ops/fast_gelu.py is quantitative: max abs error < 2e-6 over
EVERY finite bf16 input (~200x closer to the true function than the
tanh-approx gelu's 3e-4). The whole bf16 domain is only 65,280 values, so
the claim is tested by enumeration, not sampling.
"""

import numpy as np
import jax
import jax.numpy as jnp

from kosmosx_tpu.ops.fast_gelu import gelu_fast
from kosmosx_tpu.nn.layers import activation_fn


def _bf16_domain():
    bits = np.arange(65536, dtype=np.uint16)
    f32 = (bits.astype(np.uint32) << 16).view(np.float32)
    return f32[np.isfinite(f32)].astype(np.float32)


def _exact_gelu_f64(x):
    from scipy.special import erf as _erf  # fp64 reference

    xd = x.astype(np.float64)
    return xd * 0.5 * (1.0 + _erf(xd / np.sqrt(2.0)))


def test_max_abs_error_over_entire_bf16_domain():
    x = _bf16_domain()
    out = np.asarray(gelu_fast(jnp.asarray(x)), np.float64)
    err = np.abs(out - _exact_gelu_f64(x))
    assert err.max() < 2e-6, err.max()


def test_closer_to_exact_than_tanh_everywhere_it_matters():
    # on |x| <= 5 the polynomial must beat the tanh approximation by >100x
    x = np.linspace(-5, 5, 100001).astype(np.float32)
    exact = _exact_gelu_f64(x)
    fast = np.abs(np.asarray(gelu_fast(jnp.asarray(x)), np.float64) - exact)
    tanh = np.abs(np.asarray(jax.nn.gelu(jnp.asarray(x), approximate=True),
                             np.float64) - exact)
    assert fast.max() * 100 < tanh.max(), (fast.max(), tanh.max())


def test_registered_as_activation():
    fn = activation_fn("gelu_fast")
    x = jnp.asarray(np.linspace(-3, 3, 7), jnp.bfloat16)
    out = fn(x)
    assert out.dtype == jnp.bfloat16
    ref = jax.nn.gelu(x.astype(jnp.float32), approximate=False)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref.astype(jnp.bfloat16),
                                          np.float32), atol=2e-2)


def test_saturation_and_extremes():
    # large |x| must saturate EXACTLY (the linear-in-x^2 guard forces the
    # tanh to +-1), with no NaN lanes even at inf
    x = jnp.asarray([-3e38, -100.0, -12.0, 0.0, 12.0, 100.0,
                     3e38, np.inf], jnp.float32)
    out = np.asarray(gelu_fast(x))
    assert not np.isnan(out).any()
    np.testing.assert_array_equal(out[:4], [0.0, 0.0, 0.0, 0.0])
    np.testing.assert_array_equal(out[4:], np.asarray(x)[4:])
    # x = -inf is NaN in the exact erf-gelu too (-inf * 0): behaviors match
    both = [float(gelu_fast(jnp.float32(-np.inf))),
            float(jax.nn.gelu(jnp.float32(-np.inf), approximate=False))]
    assert all(np.isnan(v) for v in both), both


def test_dense_fp32_grid_error_bound():
    x = np.linspace(-40, 40, 2000001).astype(np.float32)
    out = np.asarray(gelu_fast(jnp.asarray(x)), np.float64)
    err = np.abs(out - _exact_gelu_f64(x))
    assert err.max() < 2e-6, err.max()
