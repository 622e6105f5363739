"""Optimizers and LR schedules.

Replicates the reference's optimizer surface (/root/reference/train.py:257-410):
Lion (β1=0.9, β2=0.95 per :547-556), AdamW, and zeta's ``StableAdamWUnfused``
(:393-398), with decoupled decay / no-decay parameter groups — decay for
linear weights, none for LayerNorm scales/biases and embedding tables
(:308-332). On TPU the 8-bit bitsandbytes variants (commented out in the
reference, :399-402) are unnecessary; optimizer state can instead be sharded
over the fsdp mesh axis like any other pytree.

Schedules mirror /root/reference/train.py:206-251: linear or cosine with
warmup.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


# ---------------------------------------------------------------------------
# decay / no-decay masking (reference decoupled_optimizer, train.py:257-410)
# ---------------------------------------------------------------------------

def weight_decay_mask(params) -> Any:
    """True where weight decay applies: 2D+ matmul weights. Excludes
    LayerNorm scale/bias, biases, and embedding tables (reference no-decay
    groups: LN gamma + token embedding, /root/reference/train.py:308-319)."""

    def rule(path, leaf):
        names = [str(getattr(p, "key", "")) for p in path]
        last = names[-1] if names else ""
        if last in ("scale", "bias", "b"):
            return False
        if last == "table":  # embeddings
            return False
        if last in ("class_embedding", "latents", "media_pos_emb"):
            return False
        return getattr(leaf, "ndim", 0) >= 2

    return jax.tree_util.tree_map_with_path(rule, params)


# ---------------------------------------------------------------------------
# StableAdamW (zeta StableAdamWUnfused equivalent): AdamW with per-parameter
# update clipping by the RMS of the Adam update (Wortsman et al. 2023).
# ---------------------------------------------------------------------------

class StableAdamWState(NamedTuple):
    count: jax.Array
    mu: Any
    nu: Any


def stable_adamw(learning_rate, b1: float = 0.9, b2: float = 0.99,
                 eps: float = 1e-8, weight_decay: float = 0.0,
                 mask=None) -> optax.GradientTransformation:
    """AdamW whose per-parameter update is divided by max(1, RMS(update)) —
    removes the need for global grad clipping on spiky batches."""

    def init(params):
        mu = jax.tree_util.tree_map(jnp.zeros_like, params)
        nu = jax.tree_util.tree_map(jnp.zeros_like, params)
        return StableAdamWState(jnp.zeros([], jnp.int32), mu, nu)

    def update(grads, state, params):
        count = state.count + 1
        b1c = 1 - b1 ** count.astype(jnp.float32)
        b2c = 1 - b2 ** count.astype(jnp.float32)
        mu = jax.tree_util.tree_map(lambda m, g: b1 * m + (1 - b1) * g,
                                    state.mu, grads)
        nu = jax.tree_util.tree_map(lambda v, g: b2 * v + (1 - b2) * g * g,
                                    state.nu, grads)
        lr = learning_rate(count) if callable(learning_rate) else learning_rate

        decay_mask = (mask(params) if callable(mask) else mask)

        def upd(m, v, p, dm):
            u = (m / b1c) / (jnp.sqrt(v / b2c) + eps)
            rms = jnp.sqrt(jnp.mean(jnp.square(u)) + 1e-16)
            u = u / jnp.maximum(1.0, rms)
            wd = weight_decay if decay_mask is None else weight_decay * dm
            return -lr * (u + wd * p)

        if decay_mask is None:
            updates = jax.tree_util.tree_map(
                lambda m, v, p: upd(m, v, p, 1.0), mu, nu, params)
        else:
            updates = jax.tree_util.tree_map(
                lambda m, v, p, dm: upd(m, v, p, jnp.float32(dm)),
                mu, nu, params, decay_mask)
        return updates, StableAdamWState(count, mu, nu)

    return optax.GradientTransformation(init, update)


# ---------------------------------------------------------------------------
# schedules (reference train.py:206-251: linear/cosine + warmup)
# ---------------------------------------------------------------------------

def make_schedule(name: str, learning_rate: float, total_steps: int,
                  warmup_steps: Optional[int] = None,
                  final_scale: float = 0.0):
    warmup = warmup_steps if warmup_steps is not None else max(total_steps // 100, 1)
    if name == "cosine":
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=learning_rate, warmup_steps=warmup,
            decay_steps=total_steps, end_value=learning_rate * final_scale)
    if name == "linear":
        return optax.join_schedules([
            optax.linear_schedule(0.0, learning_rate, warmup),
            optax.linear_schedule(learning_rate, learning_rate * final_scale,
                                  max(total_steps - warmup, 1)),
        ], [warmup])
    if name == "constant":
        return optax.join_schedules([
            optax.linear_schedule(0.0, learning_rate, warmup),
            optax.constant_schedule(learning_rate),
        ], [warmup])
    raise ValueError(f"unknown schedule: {name}")


# ---------------------------------------------------------------------------
# optimizer factory (reference optimizer menu, train.py:375-398)
# ---------------------------------------------------------------------------

def make_optimizer(name: str, schedule, *, weight_decay: float = 0.1,
                   beta1: float = 0.9, beta2: float = 0.95,
                   grad_clip: Optional[float] = 1.0,
                   params_for_mask=None) -> optax.GradientTransformation:
    """name in {"lion", "adamw", "stable_adamw", "adamw8bit", "lion8bit"}.
    Defaults mirror the reference Train(): Lion(lr 1e-4, wd 0.1,
    betas (0.9, 0.95)) (/root/reference/train.py:547-556) and grad-clip 1.0
    (:652). The 8-bit variants keep moments in blockwise-int8 (the bnb
    Adam8bit/Lion8bit the reference ships commented out, :399-402)."""
    mask = weight_decay_mask if params_for_mask is None else \
        weight_decay_mask(params_for_mask)
    if name == "lion":
        opt = optax.lion(learning_rate=schedule, b1=beta1, b2=beta2,
                         weight_decay=weight_decay, mask=mask)
    elif name == "adamw":
        opt = optax.adamw(learning_rate=schedule, b1=beta1, b2=beta2,
                          weight_decay=weight_decay, mask=mask)
    elif name == "stable_adamw":
        opt = stable_adamw(schedule, b1=beta1, b2=beta2,
                           weight_decay=weight_decay, mask=mask)
    elif name == "adamw8bit":
        from kosmosx_tpu.train.quant import adamw8bit
        opt = adamw8bit(schedule, b1=beta1, b2=beta2,
                        weight_decay=weight_decay, mask=mask)
    elif name == "lion8bit":
        from kosmosx_tpu.train.quant import lion8bit
        opt = lion8bit(schedule, b1=beta1, b2=beta2,
                       weight_decay=weight_decay, mask=mask)
    else:
        raise ValueError(f"unknown optimizer: {name}")
    if grad_clip is not None:
        opt = optax.chain(optax.clip_by_global_norm(grad_clip), opt)
    return opt
