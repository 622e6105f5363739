"""Weight-only int8 quantization for inference (W8).

Decode on a single chip is weight-read bound (BASELINE.md: 911 tok/s at
batch 8 ≈ the 5.8 GB bf16 param-read floor). Storing linear weights and
embedding tables as int8 halves the bytes read per step; the per-output-
channel (linear) / per-row (embedding) fp32 scale commutes out of the
contraction so ``(x @ q) * scale`` is exact algebra over the quantized
codes. nn/layers.linear and nn/layers.embedding consume the quantized
leaves transparently, so every model in the package (decoder, CLIP ViT,
resampler, audio/video towers) works quantized with no other changes.

This is the inference-side counterpart of the reference's bitsandbytes
int8 machinery (bnb.nn.Embedding at /root/reference/kosmosx/model.py:161-163,
8-bit optimizers in train/quant.py).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def _quantize_w(w):
    """(…, in, out) -> {"q": int8, "scale": (…, 1, out)} per-output-channel
    (reduction over the contraction axis only, so stacked scan-layer weights
    get independent per-layer scales)."""
    absmax = jnp.max(jnp.abs(w), axis=-2, keepdims=True)
    scale = jnp.where(absmax == 0, 1.0, absmax / 127.0).astype(jnp.float32)
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "scale": scale}


def _quantize_table(t):
    """(…, V, D) -> {"q": int8, "scale": (…, V, 1)} per-row (bnb-embedding
    style)."""
    absmax = jnp.max(jnp.abs(t), axis=-1, keepdims=True)
    scale = jnp.where(absmax == 0, 1.0, absmax / 127.0).astype(jnp.float32)
    q = jnp.clip(jnp.round(t / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "scale": scale}


def quantize_params_w8(params, *, min_size: int = 4096) -> Any:
    """Quantize every linear weight (leaf named "w", ndim >= 2) and embedding
    table (leaf named "table", ndim >= 2) above ``min_size`` elements to
    weight-only int8. Everything else (LayerNorm, biases, latents, small
    projections) stays in its original dtype."""

    def rule(path, leaf):
        if not hasattr(leaf, "ndim") or leaf.ndim < 2 or leaf.size < min_size:
            return leaf
        if not jnp.issubdtype(leaf.dtype, jnp.floating):
            return leaf
        last = str(getattr(path[-1], "key", ""))
        if last == "w":
            return _quantize_w(leaf)
        if last == "table":
            return _quantize_table(leaf)
        return leaf

    return jax.tree_util.tree_map_with_path(rule, params)


def w8_param_bytes(params) -> int:
    return sum(x.size * x.dtype.itemsize
               for x in jax.tree_util.tree_leaves(params))
