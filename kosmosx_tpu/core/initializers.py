"""Parameter initializers, including the Magneto (sub-LN) init scheme.

The reference relies on torchscale's Decoder init: xavier projections, then —
because ``subln=True`` — the weights of ``fc1 / fc2 / out_proj / v_proj`` are
scaled by gamma = sqrt(log(2 * num_layers)) (the Magneto init; see
/root/reference/README.md:60 "Magneto ... Sub-LN and the Scaled Initialization").
The output projection is explicitly N(0, embed_dim**-0.5)
(/root/reference/kosmosx/model.py:166-167, 205-206).

All initializers return fp32 params; compute-dtype casting happens at apply
time (core/dtypes.py).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def magneto_gamma(num_layers: int) -> float:
    """Magneto decoder-only init gain: sqrt(log(2N))."""
    return math.sqrt(math.log(2.0 * num_layers))


def xavier_uniform(key, shape, gain: float = 1.0, dtype=jnp.float32):
    """Glorot/Xavier uniform for a (fan_in, fan_out) weight matrix.

    We store all linear weights as (in_features, out_features) so the apply is
    ``x @ w`` with no transpose (row-major friendly for the MXU).
    """
    fan_in, fan_out = shape[0], shape[-1]
    limit = gain * math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, minval=-limit, maxval=limit)


def normal(key, shape, std: float = 1.0, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype) * std


def zeros(shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


def ones(shape, dtype=jnp.float32):
    return jnp.ones(shape, dtype)


def magneto_output_projection(key, shape, dtype=jnp.float32):
    """N(0, d_model**-0.5) — the reference's explicit init for output/image
    projections (/root/reference/kosmosx/model.py:166-167)."""
    d_model = shape[0]
    return normal(key, shape, std=d_model ** -0.5, dtype=dtype)


def embedding_init(key, shape, dtype=jnp.float32):
    """Token/positional embedding tables: N(0, d**-0.5) (fairseq convention)."""
    d = shape[-1]
    return normal(key, shape, std=d ** -0.5, dtype=dtype)
