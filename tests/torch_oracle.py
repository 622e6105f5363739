"""Independent torch re-implementation of the Magneto decoder semantics.

SURVEY.md §7 prescribes a "hand-written torch mini-decoder in the test
harness reproducing torchscale semantics" as the numerical-parity oracle
(torchscale itself is not installed here; its behavior is reconstructed from
SURVEY.md §2.1/§3.1: sub-LN placement, xPos rotation+decay, embed-scale,
Magneto init is irrelevant because the oracle CONSUMES the JAX params).

Given the param pytree produced by ``kosmosx_tpu.nn.decoder.init_decoder``
(converted to numpy), computes the same forward pass with torch ops. Any
disagreement beyond float tolerance indicates a cross-framework math bug
(transposition, LN eps, gelu flavor, mask alignment, softmax dtype, ...).

Decoder-only path: multiway split is None, so expert "A" everywhere.
"""

from __future__ import annotations

import math

import numpy as np
import torch


def _mw(p):
    """Select multiway expert A when present."""
    return p["A"] if isinstance(p, dict) and "A" in p else p


def _t(x) -> torch.Tensor:
    return torch.from_numpy(np.array(x)).to(torch.float32)


def _linear(p, x):
    p = _mw(p)
    y = x @ _t(p["w"])
    if "b" in p:
        y = y + _t(p["b"])
    return y


def _layer_norm(p, x, eps=1e-5):
    p = _mw(p)
    mean = x.mean(-1, keepdim=True)
    var = ((x - mean) ** 2).mean(-1, keepdim=True)
    y = (x - mean) * torch.rsqrt(var + eps) * _t(p["scale"])
    if "bias" in p:
        y = y + _t(p["bias"])
    return y


def _rotate_every_two(x):
    x1 = x[..., ::2]
    x2 = x[..., 1::2]
    return torch.stack((-x2, x1), dim=-1).reshape(x.shape)


def _apply_xpos(x, *, scale_base=512, downscale=False, center=None):
    """x: (B, H, L, hd). Mirrors kosmosx_tpu.nn.xpos semantics (which in turn
    mirror torchscale XPOS: rotate-every-two rotary + zeta**((pos-center)/sb)
    decay, queries upscaled / keys downscaled)."""
    length, hd = x.shape[-2], x.shape[-1]
    half = hd // 2
    pos = torch.arange(length, dtype=torch.float32)
    if center is None:
        center = length // 2
    power = (pos - float(center)) / float(scale_base)
    zeta = (torch.arange(0, hd, 2, dtype=torch.float32) + 0.4 * hd) / (1.4 * hd)
    scale = zeta[None, :] ** power[:, None]                  # (L, half)
    if downscale:
        scale = 1.0 / scale
    inv_freq = 1.0 / (10000.0 ** (torch.arange(half, dtype=torch.float32) / half))
    sinusoid = pos[:, None] * inv_freq[None, :]              # (L, half)
    sin = torch.repeat_interleave(torch.sin(sinusoid) * scale, 2, dim=-1)
    cos = torch.repeat_interleave(torch.cos(sinusoid) * scale, 2, dim=-1)
    return x * cos + _rotate_every_two(x) * sin


def _self_attention(p, x, heads, *, xpos=True, xpos_scale_base=512):
    b, l, d = x.shape
    hd = d // heads
    q = _linear(p["q"], x) * (hd ** -0.5)
    k = _linear(p["k"], x)
    v = _linear(p["v"], x)

    def split(z):
        return z.reshape(b, l, heads, hd).permute(0, 2, 1, 3)

    q, k, v = split(q), split(k), split(v)
    if xpos:
        q = _apply_xpos(q, scale_base=xpos_scale_base, downscale=False,
                        center=l // 2)
        k = _apply_xpos(k, scale_base=xpos_scale_base, downscale=True,
                        center=l // 2)
    s = q @ k.transpose(-1, -2)
    mask = torch.tril(torch.ones(l, l, dtype=torch.bool))
    s = s.masked_fill(~mask, torch.finfo(torch.float32).min)
    o = torch.softmax(s, dim=-1) @ v
    o = o.permute(0, 2, 1, 3).reshape(b, l, d)
    if "inner_ln" in p:                                      # sub-LN
        o = _layer_norm(p["inner_ln"], o)
    return _linear(p["out"], o)


def _ffn(p, x, activation="gelu"):
    p = _mw(p)
    h = _linear(p["fc1"], x)
    assert activation == "gelu"
    h = torch.nn.functional.gelu(h)                          # exact erf gelu
    if "ffn_ln" in p:                                        # sub-LN
        h = _layer_norm(p["ffn_ln"], h)
    return _linear(p["fc2"], h)


def _run_stack(params, x, cfg):
    for lp in params["layers"]:
        residual = x
        h = _layer_norm(lp["attn_ln"], x)
        h = _self_attention(lp["attn"], h, cfg.heads,
                            xpos=cfg.xpos_rel_pos,
                            xpos_scale_base=cfg.xpos_scale_base)
        x = residual + h
        residual = x
        h = _layer_norm(lp["final_ln"], x)
        h = _ffn(lp["ffn"], h, activation=cfg.activation)
        x = residual + h

    x = _layer_norm(params["ln"], x)
    return (x @ _t(params["out_proj"]["w"])).numpy()


def decoder_forward_oracle(params, tokens, cfg):
    """Mirror of kosmosx_tpu.nn.decoder.decoder_forward at fp32, eval mode.

    params: init_decoder pytree converted to numpy (scan_layers=False layout:
    params["layers"] is a list). tokens: (B, L) numpy int. Returns numpy
    logits (B, L, vocab).
    """
    tokens = torch.from_numpy(np.array(tokens)).long()
    emb = _t(params["embed"]["table"])[tokens]               # (B, L, D)
    x = cfg.embed_scale * emb
    l = tokens.shape[1]
    positions = cfg.padding_idx + 1 + torch.arange(l)
    x = x + _t(params["pos"]["table"])[positions][None]
    return _run_stack(params, x, cfg)


def spliced_forward_oracle(params, spliced, cfg, *, double_scale=True):
    """The Kosmos splice path at decoder level: ``spliced`` (B, L, D) is the
    position-free scaled-text+image-block sequence (the reference's
    ``model_input`` after the cat at /root/reference/kosmosx/model.py:239-241);
    the RE-EMBED step multiplies by embed_scale AGAIN (the §2.6.1 double-scale
    quirk, ``double_scale=True``) and adds learned positions, then runs the
    stack. Mirrors kosmosx_tpu.models.kosmos.Kosmos.apply with
    parity_double_scale."""
    x = _t(spliced)
    if double_scale:
        x = cfg.embed_scale * x
    l = x.shape[1]
    positions = cfg.padding_idx + 1 + torch.arange(l)
    x = x + _t(params["pos"]["table"])[positions][None]
    return _run_stack(params, x, cfg)
