"""CLIP ViT vision tower (JAX, functional params).

The reference hard-codes HF ``CLIPModel.from_pretrained("laion/CLIP-ViT-L-14-
laion2B-s32B-b82K").vision_model`` (/root/reference/kosmosx/model.py:154-156)
and consumes its ``last_hidden_state`` (B, 257, 1024) at :230. This module is
a from-scratch JAX ViT with the same architecture and HF-CLIP semantics:

- patch embedding: 14x14 stride-14 conv, no bias — implemented as
  space-to-depth reshape + one (588 -> 1024) matmul, which maps straight onto
  the MXU instead of going through conv layout shuffles;
- learned class embedding prepended, learned absolute position embeddings
  (257 rows) added, then a pre-LayerNorm (HF ``pre_layrnorm``);
- pre-LN encoder layers: LN -> MHA (q/k/v/out, biased) -> +res;
  LN -> MLP (fc1 -> gelu -> fc2) -> +res;
- ``last_hidden_state`` is returned *without* the final post-LayerNorm (HF
  applies ``post_layernorm`` only to the CLS pooled output — which is what the
  reference consumes, so parity demands the un-normed hidden states);
- laion-2B CLIP uses exact gelu (OpenAI CLIP would be quick_gelu; the
  activation is configurable via VisionConfig.activation).

Weight conversion from HF checkpoints lives in utils/hf_convert.py.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from kosmosx_tpu.core import initializers as init
from kosmosx_tpu.core.config import VisionConfig
from kosmosx_tpu.nn import layers
from kosmosx_tpu.ops.flash_attention import flash_attention

# CLIP preprocessing constants (CLIPProcessor image normalization; the
# reference applies these host-side through CLIPProcessor at
# /root/reference/kosmosx/model.py:82-99 — we do it on device, data/images.py).
CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


def init_vit_layer(key, cfg: VisionConfig):
    kq, kk, kv, ko, k1, k2 = jax.random.split(key, 6)
    d, m = cfg.hidden_dim, cfg.mlp_dim
    # HF CLIP init: normal(std=factor * d**-0.5-ish); exactness is irrelevant
    # for converted checkpoints — xavier keeps random init trainable.
    def lin(k_, i, o):
        return {"w": init.xavier_uniform(k_, (i, o)), "b": init.zeros((o,))}
    return {
        "ln1": layers.init_layer_norm(d),
        "attn": {"q": lin(kq, d, d), "k": lin(kk, d, d), "v": lin(kv, d, d),
                 "out": lin(ko, d, d)},
        "ln2": layers.init_layer_norm(d),
        "mlp": {"fc1": lin(k1, d, m), "fc2": lin(k2, m, d)},
    }


def init_clip_vit(key, cfg: VisionConfig) -> Dict[str, Any]:
    keys = jax.random.split(key, 6)
    d = cfg.hidden_dim
    patch_dim = 3 * cfg.patch_size * cfg.patch_size
    layer_keys = jax.random.split(keys[4], cfg.layers)
    return {
        "class_embedding": init.normal(keys[0], (d,), std=d ** -0.5),
        "patch_embed": {"w": init.xavier_uniform(keys[1], (patch_dim, d))},
        "pos_embed": {"table": init.normal(keys[2], (cfg.seq_len, d), std=d ** -0.5)},
        "pre_ln": layers.init_layer_norm(d),
        "layers": [init_vit_layer(k, cfg) for k in layer_keys],
        "post_ln": layers.init_layer_norm(d),
    }


def _vit_attention(params, x, cfg: VisionConfig, *, interpret: bool = False):
    b, l, d = x.shape
    h = cfg.heads
    hd = cfg.head_dim
    q = layers.linear(params["q"], x, dtype=cfg.dtype) * (hd ** -0.5)
    k = layers.linear(params["k"], x, dtype=cfg.dtype)
    v = layers.linear(params["v"], x, dtype=cfg.dtype)
    q = q.reshape(b, l, h, hd).transpose(0, 2, 1, 3)
    k = k.reshape(b, l, h, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, l, h, hd).transpose(0, 2, 1, 3)
    if cfg.use_flash_attention and l >= 512:
        o = flash_attention(q, k, v, causal=False, sm_scale=1.0,
                            interpret=interpret)
    else:
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v)
    o = o.transpose(0, 2, 1, 3).reshape(b, l, d)
    return layers.linear(params["out"], o, dtype=cfg.dtype)


def patchify(pixel_values, patch_size: int):
    """(B, 3, H, W) -> (B, (H/p)*(W/p), 3*p*p) with per-patch (c, ph, pw)
    channel ordering — the exact flattening a stride-p conv contracts over,
    so HF conv weights convert by a single reshape."""
    b, c, hh, ww = pixel_values.shape
    hp, wp = hh // patch_size, ww // patch_size
    x = pixel_values.reshape(b, c, hp, patch_size, wp, patch_size)
    x = x.transpose(0, 2, 4, 1, 3, 5)  # (B, hp, wp, c, p, p)
    return x.reshape(b, hp * wp, c * patch_size * patch_size)


def clip_vit(params, pixel_values, cfg: VisionConfig, *,
             interpret: bool = False, return_pooled: bool = False):
    """pixel_values (B, 3, 224, 224), already CLIP-normalized.
    Returns last_hidden_state (B, 257, 1024); with ``return_pooled`` also the
    post-LN CLS pooled vector (B, 1024)."""
    dtype = cfg.dtype
    b = pixel_values.shape[0]
    patches = patchify(pixel_values.astype(dtype), cfg.patch_size)
    # through layers.linear so int8-quantized patch embeds work (W8 path)
    x = layers.linear(params["patch_embed"], patches, dtype=dtype)  # (B, 256, d)
    cls = jnp.broadcast_to(params["class_embedding"].astype(dtype),
                           (b, 1, cfg.hidden_dim))
    x = jnp.concatenate([cls, x], axis=1)  # (B, 257, d)
    x = x + layers.dense_weight(params["pos_embed"]["table"], dtype)[None]
    x = layers.layer_norm(params["pre_ln"], x, eps=cfg.layer_norm_eps)

    act = layers.activation_fn(cfg.activation)

    def one_layer(lp, xx):
        h = layers.layer_norm(lp["ln1"], xx, eps=cfg.layer_norm_eps)
        xx = xx + _vit_attention(lp["attn"], h, cfg, interpret=interpret)
        h = layers.layer_norm(lp["ln2"], xx, eps=cfg.layer_norm_eps)
        h = layers.linear(lp["mlp"]["fc1"], h, dtype=dtype)
        h = act(h.astype(jnp.float32)).astype(dtype)
        h = layers.linear(lp["mlp"]["fc2"], h, dtype=dtype)
        return xx + h

    if cfg.remat:
        one_layer = jax.checkpoint(one_layer, prevent_cse=False)
    for lp in params["layers"]:
        x = one_layer(lp, x)

    if return_pooled:
        pooled = layers.layer_norm(params["post_ln"], x[:, 0],
                                   eps=cfg.layer_norm_eps)
        return x, pooled
    return x
