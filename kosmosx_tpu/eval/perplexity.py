"""Jitted perplexity evaluation over packed token batches.

Implements the metric the reference left commented out
(/root/reference/tests/test_benchmarking.py:225-239: `exp(cross_entropy)`),
but correctly token-weighted across batches: we accumulate summed NLL and
token counts on device and exponentiate once at the end, instead of
averaging per-batch perplexities.
"""

from __future__ import annotations

from typing import Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from kosmosx_tpu.core.config import MagnetoConfig
from kosmosx_tpu.nn.decoder import decoder_forward
from kosmosx_tpu.train.loss import next_token_loss


def make_eval_step(cfg: MagnetoConfig):
    """Returns a jitted step(params, input_ids, mask) -> (nll_sum, n_tokens).

    The forward runs in the config's compute dtype (bf16 on TPU); the NLL is
    reduced in fp32 (next_token_loss casts logits up before logsumexp).
    Right-padding is assumed (packed blocks are full; ragged eval rows pad at
    the end, where causal attention already ignores them for real queries).
    """

    @jax.jit
    def step(params, input_ids, mask):
        logits = decoder_forward(params, input_ids, cfg)
        _, metrics = next_token_loss(logits, input_ids, mask)
        return metrics["cross_entropy"] * metrics["tokens"], metrics["tokens"]

    return step


def evaluate_perplexity(params, batches: Iterable[Dict[str, np.ndarray]],
                        cfg: MagnetoConfig, *,
                        max_batches: Optional[int] = None) -> Dict[str, float]:
    """Token-weighted perplexity over ``{"input_ids", "attention_mask"}``
    batches (as produced by train.data.packed_text_batches).

    Returns {perplexity, cross_entropy, tokens, batches}.
    """
    step = make_eval_step(cfg)
    nll_sum = 0.0
    tok_sum = 0.0
    n = 0
    for batch in batches:
        if max_batches is not None and n >= max_batches:
            break
        ids = jnp.asarray(batch["input_ids"])
        mask = jnp.asarray(batch.get("attention_mask",
                                     np.ones(ids.shape, np.int32)))
        nll, toks = step(params, ids, mask)
        nll_sum += float(nll)   # host fetch = the only reliable sync (CLAUDE.md)
        tok_sum += float(toks)
        n += 1
    ce = nll_sum / max(tok_sum, 1.0)
    return {"perplexity": float(np.exp(ce)), "cross_entropy": ce,
            "tokens": tok_sum, "batches": n}
