"""KosmosConditional — modality-conditional multimodal model.

Re-design of the reference's cleanest experimental variant
(/root/reference/experimental/model/video/kosmos_conditional.py): a
``modalities`` list gates which encoder towers are *built*
(:18-53,117-154) and which branches run in forward via kwarg presence
(:205-236). Modalities: text (always), image (CLIP ViT + resampler), audio
(wav2vec2-style encoder, mean-pooled), video (r3d-style 3D resnet).

Splice layout (generalizing /root/reference/experimental/model/video/
kosmos_video.py:201-204, which hard-codes ``[:, 0:6]`` after the six special
tokens): each provided modality contributes an embedding block spliced after
the text prefix, in (image, audio, video) order:

    [BOS, <image></image><audio></audio><video></video>,
     64 image | 1 audio | 1 video embeddings..., text...]

Also fixes the reference's bug where ``videos`` is missing from the forward
signature (kosmos_video.py:185,196 — SURVEY.md §2.5) and threads a correct
padding mask.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from kosmosx_tpu.core import initializers as init
from kosmosx_tpu.core.config import (AudioConfig, KosmosConfig, MagnetoConfig,
                                     ResamplerConfig, VideoConfig,
                                     VisionConfig)
from kosmosx_tpu.nn import decoder as dec
from kosmosx_tpu.nn import layers
from kosmosx_tpu.nn.audio import audio_encoder, init_audio_encoder
from kosmosx_tpu.nn.resampler import init_resampler, resampler
from kosmosx_tpu.nn.video import init_video_encoder, video_encoder
from kosmosx_tpu.nn.vision import clip_vit, init_clip_vit

MODALITIES = ("text", "image", "audio", "video")


class KosmosConditional:
    """Build-what-you-need multimodal decoder (reference kosmos_conditional)."""

    def __init__(self,
                 modalities: Sequence[str] = ("text", "image"),
                 decoder: Optional[MagnetoConfig] = None,
                 vision: Optional[VisionConfig] = None,
                 resampler: Optional[ResamplerConfig] = None,
                 audio: Optional[AudioConfig] = None,
                 video: Optional[VideoConfig] = None,
                 image_embed_len: int = 64,
                 seed: int = 0,
                 params=None):
        unknown = set(modalities) - set(MODALITIES)
        if unknown:
            raise ValueError(f"unknown modalities: {unknown}")
        self.modalities = tuple(m for m in MODALITIES if m in set(modalities) | {"text"})
        self.decoder = decoder or MagnetoConfig()
        self.vision = vision or VisionConfig()
        self.resampler = resampler or ResamplerConfig()
        self.audio = audio or AudioConfig()
        self.video = video or VideoConfig()
        self.image_embed_len = image_embed_len
        self.params = (params if params is not None
                       else self.init(jax.random.PRNGKey(seed)))

    # -- init (conditional construction) ------------------------------------
    def init(self, key) -> Dict[str, Any]:
        keys = jax.random.split(key, 8)
        d = self.decoder.embed_dim
        params: Dict[str, Any] = {
            "decoder": dec.init_decoder(keys[0], self.decoder)}
        if "image" in self.modalities:
            params["clip"] = init_clip_vit(keys[1], self.vision)
            params["resampler"] = init_resampler(keys[2], self.resampler)
            params["image_proj"] = {"w": init.magneto_output_projection(
                keys[3], (self.resampler.dim, d))}
        if "audio" in self.modalities:
            params["audio_enc"] = init_audio_encoder(keys[4], self.audio)
            params["audio_proj"] = {"w": init.magneto_output_projection(
                keys[5], (self.audio.hidden_dim, d))}
        if "video" in self.modalities:
            params["video_enc"] = init_video_encoder(keys[6], self.video)
            params["video_proj"] = {"w": init.magneto_output_projection(
                keys[7], (self.video.hidden_dim, d))}
        return params

    # -- forward -------------------------------------------------------------
    def apply(self, params, text_tokens, *, images=None, audios=None,
              videos=None, rng=None, use_padding_mask: bool = True):
        dcfg = self.decoder
        blocks = []
        if images is not None:
            assert "image" in self.modalities, "model built without image tower"
            feats = clip_vit(params["clip"], images, self.vision)
            lat = resampler(params["resampler"], feats, self.resampler)[:, 0]
            blocks.append(layers.linear(params["image_proj"], lat,
                                        dtype=dcfg.dtype))
        if audios is not None:
            assert "audio" in self.modalities, "model built without audio tower"
            a = audio_encoder(params["audio_enc"], audios, self.audio)
            a = jnp.mean(a, axis=1, keepdims=True)  # mean-pool (reference)
            blocks.append(layers.linear(params["audio_proj"], a,
                                        dtype=dcfg.dtype))
        if videos is not None:
            assert "video" in self.modalities, "model built without video tower"
            vfeat = video_encoder(params["video_enc"], videos, self.video)
            blocks.append(layers.linear(params["video_proj"], vfeat[:, None],
                                        dtype=dcfg.dtype))

        text_emb = dec.embed_only(params["decoder"], dcfg, text_tokens)
        if blocks:
            media = jnp.concatenate(blocks, axis=1)
            spliced = jnp.concatenate(
                [text_emb[:, :1], media.astype(text_emb.dtype),
                 text_emb[:, 1:]], axis=1)  # after BOS
        else:
            media = None
            spliced = text_emb

        # Split the dropout key: embedding dropout and layer dropout must be
        # decorrelated (matches Kosmos.apply; reusing one key correlates masks).
        rngs = list(jax.random.split(rng, 2)) if rng is not None else [None, None]
        x, _ = dec.forward_embedding(params["decoder"], dcfg,
                                     token_embedding=spliced, rng=rngs[0])
        segment_ids = None
        if use_padding_mask:
            b = text_tokens.shape[0]
            text_valid = (text_tokens != dcfg.padding_idx)
            k = media.shape[1] if media is not None else 0
            valid = jnp.concatenate(
                [text_valid[:, :1], jnp.ones((b, k), bool), text_valid[:, 1:]],
                axis=1)
            segment_ids = jnp.where(valid, 0, -1).astype(jnp.int32)
        h, _ = dec.run_layers(params["decoder"], x, dcfg,
                              segment_ids=segment_ids, rng=rngs[1])
        return dec.output_logits(params["decoder"], h, dcfg)

    def __call__(self, text_tokens, **kw):
        return self.apply(self.params, jnp.asarray(text_tokens), **kw)

    forward = __call__

    @property
    def num_params(self) -> int:
        return sum(x.size for x in jax.tree_util.tree_leaves(self.params))
