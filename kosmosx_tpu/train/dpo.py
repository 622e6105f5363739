"""Direct Preference Optimization (DPO) fine-tuning.

Capability beyond the reference (its training is next-token CE only, and
even that is broken upstream — SURVEY.md §2.6.4). TPU-native design:

- the frozen reference model's log-probs are PRECOMPUTED once per batch
  (``compute_ref_logprobs``) instead of keeping a second 2.88B model in the
  training step — halves step memory and keeps the Trainer's
  ``loss_fn(params, batch, rng)`` contract, so DPO composes with remat,
  FSDP sharding, LoRA (adapt the policy only) and int8 optimizer state
  unchanged;
- sequence log-probs are one forward + a gathered log-softmax, weighted by
  a completion mask (prompt positions excluded — only the response is
  optimized).

Loss (Rafailov et al. 2023): ``-log sigma(beta * ((pi_c - pi_r) -
(ref_c - ref_r)))``; ``reference_free=True`` drops the ref term (CPO-style).
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from kosmosx_tpu.nn.decoder import decoder_forward


def sequence_logprob(params, cfg, tokens: jax.Array, weights: jax.Array,
                     rng: Optional[jax.Array] = None) -> jax.Array:
    """Sum of per-token log-probs over weighted positions.

    tokens (B, L); weights (B, L) — 1.0 on COMPLETION tokens (the labels
    whose log-prob counts), 0.0 on prompt/pad. Position t's logits predict
    token t+1, so weights align with the LABEL position convention of
    train/loss.py (weight[t] gates label tokens[t], predicted from t-1)."""
    logits = decoder_forward(params, tokens, cfg, rng=rng)
    # logits[:, t] predict tokens[:, t+1]. log p = true_logit - logsumexp
    # (the train/loss.py pattern) — never materializes a second (B, L, V)
    # fp32 log-softmax array, which matters at flagship vocab x seq.
    pred = logits[:, :-1]
    labels = tokens[:, 1:]
    w = weights[:, 1:].astype(jnp.float32)
    logz = jax.nn.logsumexp(pred.astype(jnp.float32), axis=-1)    # (B, L-1)
    true_logit = jnp.take_along_axis(
        pred, labels[..., None], axis=-1)[..., 0].astype(jnp.float32)
    return jnp.sum((true_logit - logz) * w, axis=-1)              # (B,)


@functools.lru_cache(maxsize=8)
def _seq_logprob_jit(cfg):
    """One compile per config — a fresh jit per batch would re-trace the
    full reference forward every call (minutes per compile on the remote
    chip)."""
    return jax.jit(lambda p, t, w: sequence_logprob(p, cfg, t, w))


def compute_ref_logprobs(ref_params, cfg, batch: Dict) -> Dict:
    """Add the frozen reference's sequence log-probs to a DPO batch
    (run OUTSIDE the training step, params never enter the optimizer)."""
    fn = _seq_logprob_jit(cfg)
    out = dict(batch)
    out["ref_chosen_logp"] = fn(ref_params, batch["chosen"],
                                batch["chosen_weights"])
    out["ref_rejected_logp"] = fn(ref_params, batch["rejected"],
                                  batch["rejected_weights"])
    return out


def dpo_loss_fn(model_cfg, *, beta: float = 0.1,
                reference_free: bool = False) -> Callable:
    """Trainer-compatible loss over preference batches:
    {"chosen", "chosen_weights", "rejected", "rejected_weights"
     [, "ref_chosen_logp", "ref_rejected_logp"]}."""

    def loss_fn(params, batch, rng):
        rngs = (jax.random.split(rng, 2) if rng is not None
                else (None, None))
        pi_c = sequence_logprob(params, model_cfg, batch["chosen"],
                                batch["chosen_weights"], rng=rngs[0])
        pi_r = sequence_logprob(params, model_cfg, batch["rejected"],
                                batch["rejected_weights"], rng=rngs[1])
        logits_diff = pi_c - pi_r
        if not reference_free:
            logits_diff = logits_diff - (batch["ref_chosen_logp"]
                                         - batch["ref_rejected_logp"])
        loss = -jnp.mean(jax.nn.log_sigmoid(beta * logits_diff))
        metrics = {
            "loss": loss,
            "reward_margin": jnp.mean(beta * logits_diff),
            "reward_accuracy": jnp.mean((logits_diff > 0)
                                        .astype(jnp.float32)),
            "chosen_logp": jnp.mean(pi_c),
            "rejected_logp": jnp.mean(pi_r),
        }
        return loss, metrics

    return loss_fn


def preference_batch(prompt, chosen, rejected, *, pad_id: int = 1,
                     length: Optional[int] = None) -> Dict:
    """Assemble one host-side preference batch from token-id lists.

    prompt/chosen/rejected: lists of per-example token-id lists. Each row
    becomes [prompt + completion] padded to ``length``; weights are 1.0 on
    completion tokens only."""
    import numpy as np

    def pack(completions):
        rows, ws = [], []
        for p, c in zip(prompt, completions):
            ids = list(p) + list(c)
            w = [0.0] * len(p) + [1.0] * len(c)
            rows.append(ids)
            ws.append(w)
        ln = length or max(len(r) for r in rows)
        toks = np.full((len(rows), ln), pad_id, np.int32)
        wgt = np.zeros((len(rows), ln), np.float32)
        for i, (r, w) in enumerate(zip(rows, ws)):
            if len(r) > ln:
                # silent truncation would cut the completion and feed a
                # zero-weight pair (constant log 2 loss, no gradient) —
                # fail loudly like the positional-table overflow rule
                raise ValueError(
                    f"row {i}: prompt+completion length {len(r)} exceeds "
                    f"length={ln}; raise `length`")
            toks[i, :len(r)] = r
            wgt[i, :len(r)] = w
        return toks, wgt

    ct, cw = pack(chosen)
    rt, rw = pack(rejected)
    return {"chosen": ct, "chosen_weights": cw,
            "rejected": rt, "rejected_weights": rw}
