"""Blockwise-int8 quantized optimizer state (bitsandbytes-equivalent).

The reference ships bnb's 8-bit Adam/Lion commented out
(/root/reference/train.py:399-402) and uses bnb's stable embedding designed
for them (/root/reference/kosmosx/model.py:161-163). This is the TPU-native
realization (SURVEY.md §2.4 bitsandbytes row): optimizer moments are stored
as int8 codes with one fp32 absmax scale per 256-element block — ~1.03
bytes/param/moment instead of 4 — cutting AdamW state for the 2.88B flagship
from ~23 GiB to ~6 GiB. De/requantization is pure elementwise VPU work
fused into the update; moments never materialize in fp32 outside the step.

bnb uses a nonlinear dynamic-quantization codebook; we use linear symmetric
(signed, for mu) / linear non-negative (for nu) codes, which at block 256
gives ≤ absmax/127 per-element error — enough that training curves track
fp32 closely (see tests/test_quant_optim.py).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

BLOCK = 256


def quantize_blockwise(x, *, signed: bool = True, block: int = BLOCK):
    """fp tensor -> {"q": int8/uint8 (nblocks, block), "scale": (nblocks, 1)}."""
    flat = x.astype(jnp.float32).reshape(-1)
    pad = (-flat.size) % block
    if pad:
        flat = jnp.pad(flat, (0, pad))
    blocks = flat.reshape(-1, block)
    absmax = jnp.max(jnp.abs(blocks), axis=1, keepdims=True)
    levels = 127.0 if signed else 255.0
    scale = jnp.where(absmax == 0, 1.0, absmax / levels)
    q = jnp.round(blocks / scale)
    if signed:
        q = jnp.clip(q, -127, 127).astype(jnp.int8)
    else:
        q = jnp.clip(q, 0, 255).astype(jnp.uint8)
    return {"q": q, "scale": scale}


def dequantize_blockwise(qs, shape):
    flat = (qs["q"].astype(jnp.float32) * qs["scale"]).reshape(-1)
    size = 1
    for s in shape:
        size *= s
    return flat[:size].reshape(shape)


def _q_tree(tree, *, signed: bool):
    return jax.tree_util.tree_map(
        lambda x: quantize_blockwise(x, signed=signed), tree)


class Quant8State(NamedTuple):
    count: jax.Array
    mu: Any          # tree of {"q", "scale"} (signed)
    nu: Any          # tree of {"q", "scale"} (unsigned) — None-like for lion


def adamw8bit(learning_rate, b1: float = 0.9, b2: float = 0.999,
              eps: float = 1e-8, weight_decay: float = 0.0,
              mask=None) -> optax.GradientTransformation:
    """AdamW with int8 blockwise-quantized moments (bnb Adam8bit analog)."""

    def init(params):
        mu = _q_tree(jax.tree_util.tree_map(jnp.zeros_like, params), signed=True)
        nu = _q_tree(jax.tree_util.tree_map(jnp.zeros_like, params), signed=False)
        return Quant8State(jnp.zeros([], jnp.int32), mu, nu)

    def update(grads, state, params):
        count = state.count + 1
        b1c = 1 - b1 ** count.astype(jnp.float32)
        b2c = 1 - b2 ** count.astype(jnp.float32)
        lr = learning_rate(count) if callable(learning_rate) else learning_rate
        decay_mask = mask(params) if callable(mask) else mask

        is_q = lambda t: isinstance(t, dict) and set(t) == {"q", "scale"}

        def upd(g, mq, vq, p, dm):
            g = g.astype(jnp.float32)
            m = dequantize_blockwise(mq, g.shape)
            v = dequantize_blockwise(vq, g.shape)
            m = b1 * m + (1 - b1) * g
            v = b2 * v + (1 - b2) * g * g
            u = (m / b1c) / (jnp.sqrt(v / b2c) + eps)
            wd = weight_decay * dm
            step = (-lr * (u + wd * p.astype(jnp.float32))).astype(p.dtype)
            return step, quantize_blockwise(m, signed=True), \
                quantize_blockwise(v, signed=False)

        dms = (decay_mask if decay_mask is not None
               else jax.tree_util.tree_map(lambda _: 1.0, params))
        # traverse state.mu FIRST with its {"q","scale"} dicts as leaves;
        # the other trees contribute plain array leaves at those positions
        out = jax.tree_util.tree_map(
            lambda mq, vq, g, p, dm: upd(g, mq, vq, p, jnp.float32(dm)),
            state.mu, state.nu, grads, params, dms, is_leaf=is_q)
        is_triple = lambda t: isinstance(t, tuple) and len(t) == 3
        updates = jax.tree_util.tree_map(lambda t: t[0], out, is_leaf=is_triple)
        mu = jax.tree_util.tree_map(lambda t: t[1], out, is_leaf=is_triple)
        nu = jax.tree_util.tree_map(lambda t: t[2], out, is_leaf=is_triple)
        return updates, Quant8State(count, mu, nu)

    return optax.GradientTransformation(init, update)


def lion8bit(learning_rate, b1: float = 0.9, b2: float = 0.99,
             weight_decay: float = 0.0,
             mask=None) -> optax.GradientTransformation:
    """Lion with int8 blockwise-quantized momentum (bnb Lion8bit analog)."""

    def init(params):
        mu = _q_tree(jax.tree_util.tree_map(jnp.zeros_like, params), signed=True)
        return Quant8State(jnp.zeros([], jnp.int32), mu, None)

    def update(grads, state, params):
        count = state.count + 1
        lr = learning_rate(count) if callable(learning_rate) else learning_rate
        decay_mask = mask(params) if callable(mask) else mask

        is_q = lambda t: isinstance(t, dict) and set(t) == {"q", "scale"}

        def upd(g, mq, p, dm):
            g = g.astype(jnp.float32)
            m = dequantize_blockwise(mq, g.shape)
            direction = jnp.sign(b1 * m + (1 - b1) * g)
            m = b2 * m + (1 - b2) * g
            wd = weight_decay * dm
            step = (-lr * (direction + wd * p.astype(jnp.float32))
                    ).astype(p.dtype)
            return step, quantize_blockwise(m, signed=True)

        dms = (decay_mask if decay_mask is not None
               else jax.tree_util.tree_map(lambda _: 1.0, params))
        out = jax.tree_util.tree_map(
            lambda mq, g, p, dm: upd(g, mq, p, jnp.float32(dm)),
            state.mu, grads, params, dms, is_leaf=is_q)
        is_pair = lambda t: isinstance(t, tuple) and len(t) == 2
        updates = jax.tree_util.tree_map(lambda t: t[0], out, is_leaf=is_pair)
        mu = jax.tree_util.tree_map(lambda t: t[1], out, is_leaf=is_pair)
        return updates, Quant8State(count, mu, None)

    return optax.GradientTransformation(init, update)
