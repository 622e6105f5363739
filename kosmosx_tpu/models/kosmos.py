"""Kosmos — the flagship multimodal model (CLIP ViT-L/14 + PerceiverResampler
+ Magneto decoder).

API-parity target: the reference ``Kosmos`` class
(/root/reference/kosmosx/model.py:132-253):

    Kosmos().forward(text_tokens (B, L) int, images (B, 3, 224, 224) float)
      -> logits (B, L + 64, 32002)

Forward replicates the reference call stack (SURVEY.md §3.1):
  1. VISION: CLIP ViT-L/14 last_hidden_state (B, 257, 1024)   [:230]
  2. RESAMPLE: 64 latents cross-attend -> (B, 64, 1024)        [:231]
  3. PROJECT: linear 1024 -> 2048, Magneto init                [:232]
  4. EMBED text: embed_scale * E[tokens] (no positions)        [:238]
  5. SPLICE image embeddings after [BOS, <image>] (index 2)    [:239-241]
  6. RE-EMBED: + positions; with ``parity_double_scale`` the embed_scale is
     applied AGAIN (reference quirk, SURVEY.md §2.6.1)         [:242-244]
  7. DECODE 24 Magneto layers -> output projection             [:250]

Beyond parity we add what the reference lacks: correct padding masks threaded
as segment ids (SURVEY.md §3.4), interleaved multi-image splicing
(BASELINE.json config 4), device-side image preprocessing, and KV-cache
generation (generate/).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from kosmosx_tpu.core import initializers as init
from kosmosx_tpu.core.config import KosmosConfig
from kosmosx_tpu.data.splice import splice_embeddings, spliced_segment_ids
from kosmosx_tpu.nn import decoder as dec
from kosmosx_tpu.nn import layers
from kosmosx_tpu.nn.resampler import init_resampler, resampler
from kosmosx_tpu.nn.vision import clip_vit, init_clip_vit


class Kosmos:
    """Multimodal decoder LM (reference /root/reference/kosmosx/model.py:132-253)."""

    def __init__(self, config: Optional[KosmosConfig] = None, *, seed: int = 0,
                 params=None):
        self.config = config or KosmosConfig()
        self.params = (params if params is not None
                       else self.init(jax.random.PRNGKey(seed), self.config))
        self._jit = None

    # -- pure functional surface ------------------------------------------
    @staticmethod
    def init(key, cfg: KosmosConfig) -> Dict[str, Any]:
        kc, kr, kp, kd = jax.random.split(key, 4)
        return {
            "clip": init_clip_vit(kc, cfg.vision),
            "resampler": init_resampler(kr, cfg.resampler),
            # image projection 1024 -> 2048, N(0, d**-0.5) Magneto init
            # (/root/reference/kosmosx/model.py:205-206)
            "image_proj": {"w": init.magneto_output_projection(
                kp, (cfg.resampler.dim, cfg.decoder.embed_dim))},
            "decoder": dec.init_decoder(kd, cfg.decoder),
        }

    @staticmethod
    def encode_images(params, images, cfg: KosmosConfig, *,
                      interpret: bool = False):
        """images (B, 3, H, W) or (B, M, 3, H, W), CLIP-normalized pixels ->
        (B, [M,] image_embed_len, decoder_dim)."""
        multi = images.ndim == 5
        if multi:
            b, m = images.shape[:2]
            images = images.reshape((b * m,) + images.shape[2:])
        feats = clip_vit(params["clip"], images, cfg.vision,
                         interpret=interpret)            # (B[*M], 257, 1024)
        lat = resampler(params["resampler"], feats, cfg.resampler)
        lat = lat[:, 0]                                   # (B[*M], 64, 1024)
        img = layers.linear(params["image_proj"], lat, dtype=cfg.dtype)
        if multi:
            img = img.reshape(b, m, cfg.image_embed_len, -1)
        return img

    @staticmethod
    def apply(params, text_tokens, images, cfg: KosmosConfig, *,
              image_positions=None, segment_ids=None, use_padding_mask=False,
              rng=None, interpret: bool = False, with_aux: bool = False):
        """Forward pass -> logits (B, L + M*64, vocab); with ``with_aux=True``
        -> (logits, aux) where aux is the summed MoE routing loss
        (``cfg.decoder.moe_experts`` — 0 for dense models).

        ``images``: (B, 3, H, W) single image (reference path) or
        (B, M, 3, H, W) interleaved multi-image with optional per-sample
        ``image_positions`` (B, M) <image>-token indices.
        ``use_padding_mask``: derive segment ids from padding (the mask the
        reference drops, SURVEY.md §3.4); off by default for strict parity.
        """
        dcfg = cfg.decoder
        rngs = list(jax.random.split(rng, 2)) if rng is not None else [None, None]

        img = Kosmos.encode_images(params, images, cfg, interpret=interpret)
        num_images = img.shape[1] if img.ndim == 4 else 1

        # EMBED: position-free scaled text embedding (forward_embedding()[1])
        text_emb = dec.embed_only(params["decoder"], dcfg, text_tokens)
        # SPLICE at [0:2] (after BOS + <image>)
        spliced = splice_embeddings(text_emb, img, image_positions,
                                    index=cfg.splice_index)
        # RE-EMBED: + positions (and reference double-scale if parity)
        if cfg.parity_double_scale:
            x, _ = dec.forward_embedding(params["decoder"], dcfg,
                                         token_embedding=spliced, rng=rngs[0])
        else:
            pos = layers.positional_embedding(
                params["decoder"]["pos"], spliced.shape[1],
                padding_idx=dcfg.padding_idx, dtype=dcfg.dtype)
            x = spliced + pos
            if rngs[0] is not None and dcfg.dropout > 0.0:
                x = layers.dropout(x, dcfg.dropout, rngs[0])

        if segment_ids is None and use_padding_mask:
            segment_ids = spliced_segment_ids(
                text_tokens, dcfg.padding_idx, num_images,
                cfg.image_embed_len, image_positions, index=cfg.splice_index)

        if with_aux:
            h, _, aux = dec.run_layers(params["decoder"], x, dcfg,
                                       segment_ids=segment_ids, rng=rngs[1],
                                       interpret=interpret, with_aux=True)
            return dec.output_logits(params["decoder"], h, dcfg), aux
        h, _ = dec.run_layers(params["decoder"], x, dcfg,
                              segment_ids=segment_ids, rng=rngs[1],
                              interpret=interpret)
        return dec.output_logits(params["decoder"], h, dcfg)

    # -- torch-like convenience --------------------------------------------
    def __call__(self, text_tokens, images, **kw):
        if self._jit is None:
            self._jit = jax.jit(Kosmos.apply, static_argnames=(
                "cfg", "use_padding_mask", "interpret"))
        return self._jit(self.params, jnp.asarray(text_tokens),
                         jnp.asarray(images), self.config, **kw)

    forward = __call__

    @property
    def num_params(self) -> int:
        return sum(x.size for x in jax.tree_util.tree_leaves(self.params))
