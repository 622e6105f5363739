"""Audio encoder (wav2vec2/data2vec-style): conv feature extractor +
transformer, JAX functional params.

Capability parity with the reference's experimental audio towers
(`Wav2Vec2Model` at /root/reference/experimental/model/allModalities/audio/
kosmos_audio.py and `Data2VecForCTC` at kosmos_audio_data2vec.py /
/root/reference/experimental/model/video/kosmos_video.py:126-128): raw
waveform (B, T) -> frame features -> contextual embeddings (B, T', hidden),
which the composition layer mean-pools and projects to decoder dim.

TPU-first: the conv feature extractor is expressed as framed reshape +
matmul stacks (stride == kernel for the framing layers), keeping everything
on the MXU; the context encoder reuses the framework's pre-LN transformer
pieces.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from kosmosx_tpu.core import initializers as init
from kosmosx_tpu.core.config import AudioConfig
from kosmosx_tpu.nn import layers


def frame_strides(cfg: AudioConfig):
    """Static per-stage framing strides (config, NOT params — an int leaf in
    the param pytree would turn into a tracer under jit and break the static
    reshape in `audio_encoder`)."""
    strides = (8, 4, 2)
    if len(cfg.conv_widths) > len(strides):
        raise ValueError(
            f"conv_widths has {len(cfg.conv_widths)} stages but only "
            f"{len(strides)} framing strides are defined; extra stages "
            f"would be silently dropped")
    return strides[:len(cfg.conv_widths)]


def init_audio_encoder(key, cfg: AudioConfig) -> Dict[str, Any]:
    if cfg.arch == "wav2vec2":
        from kosmosx_tpu.nn.wav2vec2 import init_wav2vec2
        if cfg.hidden_dim != cfg.w2v.hidden_dim:
            raise ValueError(
                f"arch='wav2vec2': AudioConfig.hidden_dim "
                f"({cfg.hidden_dim}) must equal w2v.hidden_dim "
                f"({cfg.w2v.hidden_dim}) — the composition layer projects "
                f"from hidden_dim")
        return init_wav2vec2(key, cfg.w2v)
    keys = jax.random.split(key, 4 + cfg.layers)
    convs = []
    in_ch = 1
    for i, (width, stride) in enumerate(zip(cfg.conv_widths,
                                            frame_strides(cfg))):
        convs.append({
            "w": init.xavier_uniform(keys[i], (in_ch * stride, width)),
            "b": init.zeros((width,)),
        })
        in_ch = width
    d = cfg.hidden_dim

    def lin(k_, i, o):
        return {"w": init.xavier_uniform(k_, (i, o)), "b": init.zeros((o,))}

    enc_layers = []
    for i in range(cfg.layers):
        k_ = jax.random.split(keys[4 + i], 6)
        enc_layers.append({
            "ln1": layers.init_layer_norm(d),
            "attn": {"q": lin(k_[0], d, d), "k": lin(k_[1], d, d),
                     "v": lin(k_[2], d, d), "out": lin(k_[3], d, d)},
            "ln2": layers.init_layer_norm(d),
            "mlp": {"fc1": lin(k_[4], d, cfg.mlp_dim),
                    "fc2": lin(k_[5], cfg.mlp_dim, d)},
        })
    return {
        "convs": convs,
        "in_proj": lin(keys[3], in_ch, d),
        "ln": layers.init_layer_norm(d),
        "layers": enc_layers,
    }


def audio_encoder(params, waveform, cfg: AudioConfig) -> jax.Array:
    """waveform (B, T) float -> (B, T', hidden_dim)."""
    if cfg.arch == "wav2vec2":
        from kosmosx_tpu.nn.wav2vec2 import wav2vec2_encode
        return wav2vec2_encode(params, waveform, cfg.w2v)
    dtype = cfg.dtype
    x = waveform.astype(dtype)[..., None]  # (B, T, 1)
    for conv, stride in zip(params["convs"], frame_strides(cfg)):
        b, t, c = x.shape
        t = (t // stride) * stride
        x = x[:, :t].reshape(b, t // stride, c * stride)
        x = layers.linear(conv, x, dtype=dtype)
        x = jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(dtype)
    x = layers.linear(params["in_proj"], x, dtype=dtype)
    x = layers.layer_norm(params["ln"], x)

    from kosmosx_tpu.nn.attention import self_attention

    for lp in params["layers"]:
        h = layers.layer_norm(lp["ln1"], x)
        o, _ = self_attention(lp["attn"], h, heads=cfg.heads, subln=False,
                              multiway=False, causal=False, xpos=False,
                              use_flash=False, dtype=dtype)
        x = x + o
        h = layers.layer_norm(lp["ln2"], x)
        h = layers.linear(lp["mlp"]["fc1"], h, dtype=dtype)
        h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(dtype)
        x = x + layers.linear(lp["mlp"]["fc2"], h, dtype=dtype)
    return x
