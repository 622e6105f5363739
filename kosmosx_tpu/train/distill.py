"""Draft-model distillation for speculative decoding.

Speculative decoding's speedup is ``(a·γ+1) / (γ·c_draft + c_verify)`` —
it lives or dies on the acceptance rate ``a``, which requires a draft that
mimics the TARGET's next-token distribution (not the data distribution).
This module trains one: forward KL from the frozen target's logits to the
draft's, over whatever token batches the caller streams in. The reference
has neither speculation nor distillation.

TPU notes: teacher and student forwards run in the same donated-buffer jit
step; the teacher is under ``lax.stop_gradient`` (no backward, no teacher
activation storage); temperature-scaled soft targets use the standard
T² gradient correction.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from kosmosx_tpu.core.config import MagnetoConfig
from kosmosx_tpu.nn import decoder as dec


def distill_loss(student_logits: jax.Array, teacher_logits: jax.Array,
                 mask: Optional[jax.Array] = None,
                 temperature: float = 1.0) -> Tuple[jax.Array, Dict]:
    """Forward KL(teacher ‖ student) per token, mean over real tokens.

    logits (B, L, V); mask (B, L) 1 for supervised positions. Soft targets
    at ``temperature`` T with the T² scale so gradients match the T=1 limit.
    """
    t = jnp.maximum(temperature, 1e-6)
    sp = jax.nn.log_softmax(student_logits.astype(jnp.float32) / t, axis=-1)
    tp = jax.nn.log_softmax(teacher_logits.astype(jnp.float32) / t, axis=-1)
    kl = jnp.sum(jnp.exp(tp) * (tp - sp), axis=-1)        # (B, L)
    if mask is None:
        mask = jnp.ones(kl.shape, jnp.float32)
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    loss = jnp.sum(kl * mask) / denom * (t * t)
    agree = jnp.sum((jnp.argmax(sp, -1) == jnp.argmax(tp, -1)) * mask) / denom
    return loss, {"distill_loss": loss, "teacher_agreement": agree}


def make_distill_step(cfg_student: MagnetoConfig, cfg_teacher: MagnetoConfig,
                      optimizer, *, temperature: float = 1.0) -> Callable:
    """Returns jitted ``step(state, teacher_params, tokens, mask) ->
    (state, metrics)`` with ``state = {"params", "opt_state"}`` (donated)."""

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state, teacher_params, tokens, mask):
        teacher_logits = jax.lax.stop_gradient(
            dec.decoder_forward(teacher_params, tokens, cfg_teacher))

        def loss_fn(p):
            student_logits = dec.decoder_forward(p, tokens, cfg_student)
            return distill_loss(student_logits, teacher_logits, mask,
                                temperature)

        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state["params"])
        updates, opt_state = optimizer.update(grads, state["opt_state"],
                                              state["params"])
        params = optax.apply_updates(state["params"], updates)
        return {"params": params, "opt_state": opt_state}, metrics

    return step


def distill_draft(teacher_params, cfg_teacher: MagnetoConfig,
                  cfg_draft: MagnetoConfig,
                  batches: Iterable[Dict], *,
                  steps: int = 200, learning_rate: float = 1e-3,
                  temperature: float = 1.0, seed: int = 0,
                  log_every: int = 0) -> Tuple[Dict, Dict]:
    """Train a fresh draft to mimic ``teacher_params``.

    ``batches`` yields ``{"input_ids": (B, L) int32[, "attention_mask"]}``
    (e.g. train.data.packed_text_batches / synthetic_text_batches).
    Returns (draft_params, final_metrics).
    """
    opt = optax.adamw(learning_rate, weight_decay=0.0)
    params = dec.init_decoder(jax.random.PRNGKey(seed), cfg_draft)
    state = {"params": params, "opt_state": opt.init(params)}
    step = make_distill_step(cfg_draft, cfg_teacher, opt,
                             temperature=temperature)
    metrics: Dict = {}
    for i, batch in enumerate(batches):
        if i >= steps:
            break
        tokens = jnp.asarray(batch["input_ids"], jnp.int32)
        mask = jnp.asarray(batch.get("attention_mask",
                                     jnp.ones(tokens.shape)), jnp.float32)
        state, metrics = step(state, teacher_params, tokens, mask)
        if log_every and (i + 1) % log_every == 0:
            m = {k: float(v) for k, v in metrics.items()}
            print(f"distill step {i + 1}: {m}")
    return state["params"], {k: float(v) for k, v in metrics.items()}
