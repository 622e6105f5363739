"""Training losses.

The reference's training loop calls ``model(inputs, return_loss=True)``
(/root/reference/train.py:647) — a signature its model doesn't have, so the
loss path is broken as written (defect SURVEY.md §2.6.4). Per the survey's
guidance we implement the *intent*: next-token cross-entropy over logits,
masked for padding, computed in fp32.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def next_token_loss(logits: jax.Array, labels: jax.Array,
                    mask: Optional[jax.Array] = None,
                    *, z_loss: float = 0.0) -> Tuple[jax.Array, dict]:
    """Causal LM loss: predict labels[:, t+1] from logits[:, t].

    logits (B, L, V); labels (B, L) int32; mask (B, L) — 1 for real tokens
    (applies to the *label* position). Returns (scalar loss, metrics).
    ``z_loss`` adds the PaLM-style log-normalizer regularizer, which also
    keeps bf16 logits from drifting.
    """
    logits = logits[:, :-1].astype(jnp.float32)
    targets = labels[:, 1:]
    if mask is None:
        mask = jnp.ones_like(targets, jnp.float32)
    else:
        mask = mask[:, 1:].astype(jnp.float32)

    logz = jax.scipy.special.logsumexp(logits, axis=-1)
    true_logit = jnp.take_along_axis(logits, targets[..., None], axis=-1)[..., 0]
    nll = logz - true_logit
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    ce = jnp.sum(nll * mask) / denom        # pure cross-entropy, for metrics
    loss = ce
    if z_loss > 0.0:
        loss = loss + z_loss * jnp.sum(jnp.square(logz) * mask) / denom

    acc = jnp.sum((jnp.argmax(logits, -1) == targets) * mask) / denom
    return loss, {"loss": loss, "cross_entropy": ce, "accuracy": acc,
                  "tokens": jnp.sum(mask), "perplexity": jnp.exp(ce)}


def multimodal_next_token_loss(logits: jax.Array, text_tokens: jax.Array,
                               image_embed_len: int, splice_index: int = 2,
                               pad_id: int = 1, *, z_loss: float = 0.0):
    """Loss for Kosmos spliced sequences (single image block, the reference
    layout): logits cover [tok0, ..., tok_{s-1}, K image positions, tok_s,
    ...]; only text tokens carry label targets.

    Boundary alignment: label tok_s sits at SPLICED position s+k, so its
    predictor is spliced position s+k-1 (the LAST image slot) — while spliced
    position s-1 (the <image> token) predicts an image embedding and gets no
    supervision. Hence we drop logits[s-1 : s+k-1], keeping exactly the
    positions whose successor is a text token (labels = the raw text tokens,
    the reference's ``labels`` field, /root/reference/kosmosx/model.py:123).
    """
    k, s = image_embed_len, splice_index
    text_logits = jnp.concatenate(
        [logits[:, :s - 1], logits[:, s + k - 1:]], axis=1)  # (B, L_text, V)
    mask = (text_tokens != pad_id)
    return next_token_loss(text_logits, text_tokens, mask, z_loss=z_loss)
