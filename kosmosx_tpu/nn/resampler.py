"""Flamingo-style PerceiverResampler (JAX, functional params).

Re-design of the ``flamingo_pytorch.PerceiverResampler`` the reference
instantiates at /root/reference/kosmosx/model.py:196-203 (dim=1024, depth=2,
dim_head=64, heads=8, num_latents=64, num_media_embeds=257). Semantics
replicated from the flamingo-pytorch implementation:

- 64 learned latents cross-attend to the media tokens; keys/values are the
  concatenation of media tokens AND latents (kv = media ⊕ latents);
- learned *per-media-slot* position embedding added to the media tokens
  (note: ``num_media_embeds`` indexes media slots, not tokens — with a single
  image only row 0 is used; the reference's 257 rows are mostly dead params,
  kept for layout parity);
- each depth step: latents += CrossAttn(media, latents); latents += FF(latents);
  attention pre-norms media and latents separately; softmax is max-subtracted;
- FF: LN -> Linear(dim, 4*dim, no bias) -> GELU -> Linear(4*dim, dim, no bias);
- final LayerNorm on the latents.

Output (B, M, 64, dim) for media-stacked input, squeezed by the caller for
single-image batches (the reference squeezes at
/root/reference/kosmosx/model.py:231).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from kosmosx_tpu.core import initializers as init
from kosmosx_tpu.core.config import ResamplerConfig
from kosmosx_tpu.nn import layers


def init_resampler(key, cfg: ResamplerConfig) -> Dict[str, Any]:
    keys = jax.random.split(key, 3 + cfg.depth)
    d, inner = cfg.dim, cfg.inner_dim

    def attn_block(k_):
        kq, kkv, ko = jax.random.split(k_, 3)
        return {
            "norm_media": layers.init_layer_norm(d),
            "norm_latents": layers.init_layer_norm(d),
            "to_q": {"w": init.xavier_uniform(kq, (d, inner))},
            "to_kv": {"w": init.xavier_uniform(kkv, (d, 2 * inner))},
            "to_out": {"w": init.xavier_uniform(ko, (inner, d))},
        }

    def ff_block(k_):
        k1, k2 = jax.random.split(k_)
        return {
            "norm": layers.init_layer_norm(d),
            "fc1": {"w": init.xavier_uniform(k1, (d, cfg.ff_mult * d))},
            "fc2": {"w": init.xavier_uniform(k2, (cfg.ff_mult * d, d))},
        }

    return {
        # flamingo uses torch.randn (std=1) for latents / media pos emb
        "latents": init.normal(keys[0], (cfg.num_latents, d), std=1.0),
        "media_pos_emb": init.normal(keys[1], (cfg.num_media_embeds, d), std=1.0),
        "layers": [{"attn": attn_block(jax.random.fold_in(keys[2], i)),
                    "ff": ff_block(keys[3 + i])}
                   for i in range(cfg.depth)],
        "norm": layers.init_layer_norm(d),
    }


def _perceiver_attention(params, media, latents, cfg: ResamplerConfig):
    """media (B, M, N, d); latents (B, M, L, d) -> (B, M, L, d)."""
    dtype = cfg.dtype
    x = layers.layer_norm(params["norm_media"], media)
    lat = layers.layer_norm(params["norm_latents"], latents)
    h, hd = cfg.heads, cfg.dim_head

    q = layers.linear(params["to_q"], lat, dtype=dtype)
    kv_input = jnp.concatenate([x, lat], axis=-2)  # (B, M, N+L, d)
    kv = layers.linear(params["to_kv"], kv_input, dtype=dtype)
    k, v = jnp.split(kv, 2, axis=-1)

    def heads_split(t):
        b, m, n, _ = t.shape
        return t.reshape(b, m, n, h, hd).transpose(0, 1, 3, 2, 4)  # (B,M,H,N,hd)

    q, k, v = heads_split(q), heads_split(k), heads_split(v)
    q = q * (hd ** -0.5)
    s = jnp.einsum("bmhid,bmhjd->bmhij", q, k, preferred_element_type=jnp.float32)
    s = s - jax.lax.stop_gradient(jnp.max(s, axis=-1, keepdims=True))
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    o = jnp.einsum("bmhij,bmhjd->bmhid", p, v)
    b, m = o.shape[:2]
    o = o.transpose(0, 1, 3, 2, 4).reshape(b, m, -1, h * hd)
    return layers.linear(params["to_out"], o, dtype=dtype)


def resampler(params, media, cfg: ResamplerConfig):
    """media (B, N, d) or (B, M, N, d) -> latents (B, M, num_latents, d)."""
    dtype = cfg.dtype
    if media.ndim == 3:
        media = media[:, None]  # single media slot
    b, m = media.shape[:2]
    media = media.astype(dtype) + params["media_pos_emb"][:m, None].astype(dtype)
    latents = jnp.broadcast_to(params["latents"].astype(dtype),
                               (b, m, cfg.num_latents, cfg.dim))
    for lp in params["layers"]:
        latents = latents + _perceiver_attention(lp["attn"], media, latents, cfg)
        ff = lp["ff"]
        hh = layers.layer_norm(ff["norm"], latents)
        hh = layers.linear(ff["fc1"], hh, dtype=dtype)
        hh = jax.nn.gelu(hh.astype(jnp.float32), approximate=False).astype(dtype)
        hh = layers.linear(ff["fc2"], hh, dtype=dtype)
        latents = latents + hh
    return layers.layer_norm(params["norm"], latents)
