"""Faithful wav2vec2 / data2vec-audio encoder (HF semantics), JAX functional.

Weight-parity twin of HF ``Wav2Vec2Model`` / ``Data2VecAudioModel`` — the
pretrained towers the reference wires into its audio/video variants
(``Data2VecForCTC`` at /root/reference/experimental/model/video/
kosmos_video.py:126-128, ``Wav2Vec2Model`` at /root/reference/experimental/
model/allModalities/audio/kosmos_audio.py). Unlike nn/audio.py (the
TPU-first framed-matmul design), this module reproduces the HF architecture
exactly so real checkpoints convert 1:1 (utils/hf_convert):

- feature extractor: VALID 1-D convs; "group" norm mode = GroupNorm with
  groups == channels after conv 0 (wav2vec2-base), "layer" mode = per-layer
  channel LayerNorm (data2vec / wav2vec2-large); gelu;
- feature projection: LayerNorm + Linear(conv_dim[-1] -> hidden);
- positional conv embedding: one weight-normed grouped conv (wav2vec2 —
  weight norm folded into a plain kernel at conversion) or a stack of
  grouped convs each + affine-less LayerNorm + gelu (data2vec); even kernels
  drop their final output column (HF SamePadLayer);
- transformer: post-LN layers (base/data2vec) or pre-LN ("stable", large).

Everything is eval-mode (dropout-free): these towers are frozen feature
extractors in the reference's composition.

TPU notes: the 1-D convs lower to XLA convolutions (NWC layout, MXU-tiled);
everything else is matmul + LN, fused by XLA. fp32 by default — parity with
the torch reference; cast via ``compute_dtype`` for speed.
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp

from kosmosx_tpu.core import initializers as init
from kosmosx_tpu.core.config import Wav2Vec2Config
from kosmosx_tpu.nn import layers


def _conv1d(w, b, x, stride: int, *, padding, groups: int = 1, dtype=None):
    """x (B, T, Cin), w (k, Cin/groups, Cout) -> (B, T', Cout)."""
    out = jax.lax.conv_general_dilated(
        x.astype(dtype) if dtype else x,
        w.astype(dtype) if dtype else w,
        window_strides=(stride,), padding=padding,
        feature_group_count=groups,
        dimension_numbers=("NWC", "WIO", "NWC"))
    if b is not None:
        out = out + (b.astype(dtype) if dtype else b)
    return out


def _channel_norm(x, scale, bias, eps):
    """GroupNorm with groups == channels: per-(B, C) normalization over
    time (HF Wav2Vec2GroupNormConvLayer). x (B, T, C)."""
    mean = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def init_wav2vec2(key, cfg: Wav2Vec2Config) -> Dict[str, Any]:
    """Random init with the converter's pytree layout (tests / from-scratch)."""
    n_conv = len(cfg.conv_dim)
    n_pos = cfg.pos_convs if cfg.pos_conv_mode == "data2vec" else 1
    keys = jax.random.split(key, n_conv + n_pos + 2 + 6 * cfg.layers)
    ki = iter(range(len(keys)))

    convs: List[Dict[str, Any]] = []
    cin = 1
    for i, (cdim, k) in enumerate(zip(cfg.conv_dim, cfg.conv_kernel)):
        p: Dict[str, Any] = {"w": init.xavier_uniform(
            keys[next(ki)], (k, cin, cdim))}
        if cfg.conv_bias:
            p["b"] = init.zeros((cdim,))
        if cfg.feat_norm == "layer" or (cfg.feat_norm == "group" and i == 0):
            p["norm"] = layers.init_layer_norm(cdim)
        convs.append(p)
        cin = cdim

    d = cfg.hidden_dim
    pos = []
    for _ in range(n_pos):
        pk = cfg.pos_conv_kernel
        pos.append({"w": init.xavier_uniform(
            keys[next(ki)], (pk, d // cfg.pos_conv_groups, d)),
            "b": init.zeros((d,))})

    def lin(k_, i, o):
        return {"w": init.xavier_uniform(k_, (i, o)), "b": init.zeros((o,))}

    enc_layers = []
    for _ in range(cfg.layers):
        ks = [keys[next(ki)] for _ in range(6)]
        enc_layers.append({
            "attn": {"q": lin(ks[0], d, d), "k": lin(ks[1], d, d),
                     "v": lin(ks[2], d, d), "out": lin(ks[3], d, d)},
            "ln1": layers.init_layer_norm(d),
            "mlp": {"fc1": lin(ks[4], d, cfg.mlp_dim),
                    "fc2": lin(ks[5], cfg.mlp_dim, d)},
            "ln2": layers.init_layer_norm(d),
        })
    return {
        "convs": convs,
        "feat_proj": {"ln": layers.init_layer_norm(cfg.conv_dim[-1]),
                      **lin(keys[next(ki)], cfg.conv_dim[-1], d)},
        "pos_conv": pos,
        "enc_ln": layers.init_layer_norm(d),
        "layers": enc_layers,
    }


def _ln(p, x, eps):
    return layers.layer_norm(p, x, eps=eps)


def _attention(p, x, heads: int, dtype):
    b, t, d = x.shape
    hd = d // heads
    q = layers.linear(p["q"], x, dtype=dtype) * (hd ** -0.5)
    k = layers.linear(p["k"], x, dtype=dtype)
    v = layers.linear(p["v"], x, dtype=dtype)

    def split(z):
        return z.reshape(b, t, heads, hd).transpose(0, 2, 1, 3)

    q, k, v = split(q), split(k), split(v)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
    o = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, axis=-1).astype(q.dtype), v)
    o = o.transpose(0, 2, 1, 3).reshape(b, t, d)
    return layers.linear(p["out"], o, dtype=dtype)


def wav2vec2_encode(params, waveform, cfg: Wav2Vec2Config) -> jax.Array:
    """waveform (B, T) float -> contextual features (B, T', hidden_dim).
    Mirrors HF ``Wav2Vec2Model.forward(input_values).last_hidden_state``
    in eval mode (no attention_mask: full valid input)."""
    dtype = cfg.dtype
    eps = cfg.layer_norm_eps
    x = waveform.astype(dtype)[..., None]  # (B, T, 1)

    # feature extractor (VALID convs, like torch's pad-free Conv1d)
    for i, (p, stride) in enumerate(zip(params["convs"], cfg.conv_stride)):
        x = _conv1d(p["w"], p.get("b"), x, stride, padding="VALID",
                    dtype=dtype)
        if cfg.feat_norm == "group" and i == 0:
            x = _channel_norm(x, p["norm"]["scale"], p["norm"]["bias"], eps)
        elif cfg.feat_norm == "layer":
            x = _ln(p["norm"], x, eps)
        x = jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(dtype)

    # feature projection
    x = _ln(params["feat_proj"]["ln"], x, eps)
    x = layers.linear({"w": params["feat_proj"]["w"],
                       "b": params["feat_proj"]["b"]}, x, dtype=dtype)

    # positional conv embedding (+ SamePad: drop last column on even kernels)
    pk = cfg.pos_conv_kernel
    pad = [(pk // 2, pk // 2)]
    if cfg.pos_conv_mode == "wav2vec2":
        p = params["pos_conv"][0]
        h = _conv1d(p["w"], p["b"], x, 1, padding=pad,
                    groups=cfg.pos_conv_groups, dtype=dtype)
        if pk % 2 == 0:
            h = h[:, :-1]
        h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(dtype)
        x = x + h
    else:  # data2vec: stacked convs, each + affine-less LN + gelu
        h = x
        for p in params["pos_conv"]:
            h = _conv1d(p["w"], p["b"], h, 1, padding=pad,
                        groups=cfg.pos_conv_groups, dtype=dtype)
            if pk % 2 == 0:
                h = h[:, :-1]
            mean = jnp.mean(h, axis=-1, keepdims=True)
            var = jnp.mean((h - mean) ** 2, axis=-1, keepdims=True)
            h = (h - mean) * jax.lax.rsqrt(var + eps)
            h = jax.nn.gelu(h.astype(jnp.float32),
                            approximate=False).astype(dtype)
        x = x + h

    if not cfg.stable_layer_norm:
        x = _ln(params["enc_ln"], x, eps)

    for lp in params["layers"]:
        if cfg.stable_layer_norm:  # pre-LN (wav2vec2-large)
            x = x + _attention(lp["attn"], _ln(lp["ln1"], x, eps),
                               cfg.heads, dtype)
            h = _ln(lp["ln2"], x, eps)
            h = layers.linear(lp["mlp"]["fc1"], h, dtype=dtype)
            h = jax.nn.gelu(h.astype(jnp.float32),
                            approximate=False).astype(dtype)
            x = x + layers.linear(lp["mlp"]["fc2"], h, dtype=dtype)
        else:  # post-LN (wav2vec2-base / data2vec-audio)
            x = _ln(lp["ln1"], x + _attention(lp["attn"], x, cfg.heads,
                                              dtype), eps)
            h = layers.linear(lp["mlp"]["fc1"], x, dtype=dtype)
            h = jax.nn.gelu(h.astype(jnp.float32),
                            approximate=False).astype(dtype)
            x = _ln(lp["ln2"], x + layers.linear(lp["mlp"]["fc2"], h,
                                                 dtype=dtype), eps)

    if cfg.stable_layer_norm:
        x = _ln(params["enc_ln"], x, eps)
    return x
