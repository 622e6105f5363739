"""Unified any-modality encoder (ImageBind-style shared trunk).

The reference sketches this with ImageBind-huge as a single encoder for every
modality (/root/reference/experimental/model/imagebind/kosmos.py:18-23,123 —
non-functional: its forward references undefined attributes, SURVEY.md §2.5).
This is the working TPU-native realization of that intent:

- per-modality TOKENIZERS map raw inputs into a shared token space:
  image (B, 3, H, W) -> 2D patches; audio waveform (B, T) -> frame patches;
  video (B, 3, T, H, W) -> spatio-temporal tubes; each followed by one
  linear into the trunk width (all MXU matmuls — no conv layout shuffles);
- ONE shared pre-LN transformer trunk (reuses the ViT layer from nn/vision)
  with a learned CLS token, learned positions, and a learned per-modality
  embedding added to every token (how the trunk knows what it is reading);
- the post-LN CLS state is the modality-agnostic embedding; callers project
  it to the decoder width and splice (models/any_modality.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

from kosmosx_tpu.core import initializers as init
from kosmosx_tpu.core.config import resolve_dtype
from kosmosx_tpu.nn import layers
from kosmosx_tpu.nn.vision import _vit_attention, init_vit_layer, patchify

MODALITIES = ("image", "audio", "video", "any")


@dataclasses.dataclass(frozen=True)
class UnifiedConfig:
    """Shared-trunk encoder config. Attribute names match VisionConfig where
    nn/vision's layer functions duck-type against them."""

    hidden_dim: int = 512
    layers: int = 6
    heads: int = 8
    mlp_dim: int = 2048
    layer_norm_eps: float = 1e-5
    activation: str = "gelu"
    compute_dtype: str = "float32"
    use_flash_attention: bool = False   # token counts here are small
    max_tokens: int = 512               # positional table (incl. CLS)
    image_patch: int = 14
    audio_patch: int = 400              # waveform samples per token (25ms @ 16kHz)
    video_tube_t: int = 2
    video_tube_hw: int = 16

    @property
    def head_dim(self) -> int:
        return self.hidden_dim // self.heads

    @property
    def dtype(self):
        return resolve_dtype(self.compute_dtype)


def init_unified_encoder(key, cfg: UnifiedConfig) -> Dict[str, Any]:
    keys = jax.random.split(key, 8)
    d = cfg.hidden_dim
    layer_keys = jax.random.split(keys[0], cfg.layers)
    return {
        "cls": init.normal(keys[1], (d,), std=d ** -0.5),
        "pos": {"table": init.normal(keys[2], (cfg.max_tokens, d), std=d ** -0.5)},
        "modality_embed": {"table": init.normal(keys[3], (len(MODALITIES), d),
                                                std=d ** -0.5)},
        "tok_image": {"w": init.xavier_uniform(
            keys[4], (3 * cfg.image_patch ** 2, d))},
        "tok_audio": {"w": init.xavier_uniform(keys[5], (cfg.audio_patch, d))},
        "tok_video": {"w": init.xavier_uniform(
            keys[6], (3 * cfg.video_tube_t * cfg.video_tube_hw ** 2, d))},
        "pre_ln": layers.init_layer_norm(d),
        "post_ln": layers.init_layer_norm(d),
        "layers": [init_vit_layer(k, cfg) for k in layer_keys],
    }


def _tokenize(params, x, modality: str, cfg: UnifiedConfig):
    """Raw input -> (B, N, hidden) trunk tokens."""
    dtype = cfg.dtype
    if modality == "image":
        patches = patchify(x.astype(dtype), cfg.image_patch)
        return layers.linear(params["tok_image"], patches, dtype=dtype)
    if modality == "audio":
        b, t = x.shape
        n = t // cfg.audio_patch
        if n == 0:
            raise ValueError(
                f"audio length {t} is shorter than one patch "
                f"(audio_patch={cfg.audio_patch}); the trunk would see zero "
                f"input tokens")
        frames = x[:, :n * cfg.audio_patch].astype(dtype).reshape(
            b, n, cfg.audio_patch)
        return layers.linear(params["tok_audio"], frames, dtype=dtype)
    if modality == "video":
        b, c, t, hh, ww = x.shape
        tt, p = cfg.video_tube_t, cfg.video_tube_hw
        nt, nh, nw = t // tt, hh // p, ww // p
        if nt == 0 or nh == 0 or nw == 0:
            raise ValueError(
                f"video shape (t={t}, h={hh}, w={ww}) smaller than one tube "
                f"(t={tt}, hw={p}); the trunk would see zero input tokens")
        tubes = x.astype(dtype).reshape(b, c, nt, tt, nh, p, nw, p)
        tubes = tubes.transpose(0, 2, 4, 6, 1, 3, 5, 7)  # (B,nt,nh,nw,c,tt,p,p)
        tubes = tubes.reshape(b, nt * nh * nw, c * tt * p * p)
        return layers.linear(params["tok_video"], tubes, dtype=dtype)
    # "any": flatten trailing dims into audio-width frames (zero-padded)
    flat = x.astype(dtype).reshape(x.shape[0], -1)
    n = max(1, -(-flat.shape[1] // cfg.audio_patch))
    width = min(flat.shape[1], n * cfg.audio_patch)
    frames = jnp.zeros((x.shape[0], n * cfg.audio_patch), dtype
                       ).at[:, :width].set(flat[:, :width])
    return layers.linear(params["tok_audio"],
                         frames.reshape(x.shape[0], n, cfg.audio_patch),
                         dtype=dtype)


def unified_encode(params, x, modality: str, cfg: UnifiedConfig, *,
                   interpret: bool = False):
    """Encode one modality through the shared trunk -> (B, 1, hidden): the
    post-LN CLS embedding (the ImageBind-style joint space)."""
    if modality not in MODALITIES:
        raise ValueError(f"unknown modality {modality!r}")
    dtype = cfg.dtype
    tokens = _tokenize(params, x, modality, cfg)
    b, n, d = tokens.shape
    if n + 1 > cfg.max_tokens:
        raise ValueError(f"{n + 1} tokens exceed max_tokens={cfg.max_tokens}")
    cls = jnp.broadcast_to(params["cls"].astype(dtype), (b, 1, d))
    x = jnp.concatenate([cls, tokens], axis=1)
    x = x + layers.dense_weight(params["pos"]["table"], dtype)[None, :n + 1]
    mod_id = MODALITIES.index(modality)
    x = x + layers.dense_weight(params["modality_embed"]["table"], dtype)[mod_id]
    x = layers.layer_norm(params["pre_ln"], x, eps=cfg.layer_norm_eps)

    act = layers.activation_fn(cfg.activation)
    for lp in params["layers"]:
        h = layers.layer_norm(lp["ln1"], x, eps=cfg.layer_norm_eps)
        x = x + _vit_attention(lp["attn"], h, cfg, interpret=interpret)
        h = layers.layer_norm(lp["ln2"], x, eps=cfg.layer_norm_eps)
        h = layers.linear(lp["mlp"]["fc1"], h, dtype=dtype)
        h = act(h.astype(jnp.float32)).astype(dtype)
        h = layers.linear(lp["mlp"]["fc2"], h, dtype=dtype)
        x = x + h

    pooled = layers.layer_norm(params["post_ln"], x[:, :1],
                               eps=cfg.layer_norm_eps)
    return pooled
