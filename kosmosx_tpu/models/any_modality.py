"""Any-modality pipeline: detector, processor registry, lazy embedders.

Re-design of the reference's ``allModalities`` experiments
(/root/reference/experimental/model/allModalities/kosmos.py, kosmos2.py,
kosmos3.py): a ``ModalityDetector`` (file-extension / array-shape / user
override, reference :47-75), a ``ModalityProcessor`` registry with caching
(:98-118), per-modality embedders built lazily on first use (kosmos3's
``KosmosEmbedder.load_model``, :296-324), and a ``KosmosAny`` model that
splices every detected modality's embeddings into the decoder sequence
(:357-368, fixing the undefined-variable bugs noted in SURVEY.md §2.5).

The reference's ``TokenizerFactory`` queries the HF hub over the network
(kosmos2.py:69-96); in a zero-egress TPU pod that is replaced by a static
registry with user-registrable entries.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from kosmosx_tpu.core import initializers as init
from kosmosx_tpu.core.config import (AudioConfig, MagnetoConfig,
                                     ResamplerConfig, VideoConfig,
                                     VisionConfig)
from kosmosx_tpu.nn import decoder as dec
from kosmosx_tpu.nn import layers

IMAGE_EXT = {".jpg", ".jpeg", ".png", ".bmp", ".gif", ".webp"}
AUDIO_EXT = {".wav", ".flac", ".mp3", ".ogg"}
VIDEO_EXT = {".mp4", ".avi", ".mov", ".mkv", ".webm"}


class ModalityDetector:
    """Detect a sample's modality from a path hint, array shape, or user
    override (reference ModalityDetector, allModalities/kosmos.py:47-75)."""

    def detect(self, data: Any, *, path: Optional[str] = None,
               user_modality: Optional[str] = None) -> str:
        if user_modality:
            return user_modality
        if path:
            ext = os.path.splitext(path)[1].lower()
            if ext in IMAGE_EXT:
                return "image"
            if ext in AUDIO_EXT:
                return "audio"
            if ext in VIDEO_EXT:
                return "video"
            if ext in {".txt", ".md", ".json"}:
                return "text"
        if isinstance(data, str):
            return "text"
        arr = np.asarray(data) if not hasattr(data, "ndim") else data
        if arr.ndim == 5:  # (B, 3, T, H, W)
            return "video"
        if arr.ndim == 4 and arr.shape[1] == 3:
            return "image"
        if arr.ndim <= 2:
            return "audio"  # raw waveform (T,) or (B, T)
        return "any"


class ModalityProcessor:
    """Per-modality preprocessing with a cache of processors (reference
    ModalityProcessor, allModalities/kosmos.py:98-118)."""

    def __init__(self):
        self._cache: Dict[str, Callable] = {}

    def register(self, modality: str, fn: Callable) -> None:
        self._cache[modality] = fn

    def process(self, modality: str, data: Any, *, image_size: int = 224):
        if modality in self._cache:
            return self._cache[modality](data)
        if modality == "image":
            from kosmosx_tpu.data.images import preprocess_images
            return preprocess_images(jnp.asarray(data), image_size=image_size)
        if modality in ("audio", "video", "any"):
            return jnp.asarray(data, jnp.float32)
        raise ValueError(f"no processor for modality {modality!r}")


class KosmosAny:
    """Any-modality Kosmos: encoders are materialized per modality at
    *registration* time (``register_modality`` — the pure-function answer to
    reference kosmos3's lazy ``load_model``), each followed by a learned
    projection to decoder dim; all embeddings splice after BOS.

    ``apply(params, text_tokens, media=...)`` is pure and jittable once every
    modality in ``media`` has been registered; ``forward`` is the convenience
    wrapper that auto-registers unseen modalities host-side (outside any
    trace) and then calls ``apply`` on ``self.params``."""

    SPECIAL_TAGS = ("<image>", "</image>", "<audio>", "</audio>",
                    "<video>", "</video>", "<any>", "</any>")

    def __init__(self, decoder: Optional[MagnetoConfig] = None,
                 seed: int = 0, image_embed_len: int = 64,
                 unified: bool = False, unified_config=None):
        """``unified=True`` routes every non-text modality through ONE
        shared-trunk encoder (nn/unified.py — the working realization of the
        reference's ImageBind sketch) instead of per-modality towers."""
        self.decoder = decoder or MagnetoConfig()
        self.image_embed_len = image_embed_len
        self.unified = unified
        self._key = jax.random.PRNGKey(seed)
        self._key, dk = jax.random.split(self._key)
        self.params: Dict[str, Any] = {"decoder": dec.init_decoder(dk, self.decoder)}
        self.detector = ModalityDetector()
        self.processor = ModalityProcessor()
        self._encoders: Dict[str, Tuple[Callable, Any]] = {}
        self.configs = {
            "image": (VisionConfig(), ResamplerConfig()),
            "audio": AudioConfig(),
            "video": VideoConfig(),
        }
        if unified:
            from kosmosx_tpu.nn.unified import UnifiedConfig
            self.unified_config = unified_config or UnifiedConfig()

    # -- encoder construction at registration (kosmos3 load_model equivalent,
    # but eager so apply() stays pure) ---------------------------------------
    def register_modality(self, modality: str, *, any_dim: Optional[int] = None):
        """Materialize the encoder + projection params for ``modality`` now.

        Must be called before ``apply`` sees that modality (``forward`` does it
        automatically). ``any_dim`` is the flattened per-sample feature size,
        required for the generic ``"any"`` modality — its projection shape
        depends on the input. Registering after a Trainer captured
        ``self.params`` means the new leaves are invisible to that optimizer;
        register everything first, then train."""
        if modality in self._encoders and (
                modality != "any" or any_dim is None
                or f"any_proj_{any_dim}" in self.params):
            return
        d = self.decoder.embed_dim
        self._key, k1, k2, k3 = jax.random.split(self._key, 4)
        if self.unified:
            from kosmosx_tpu.nn.unified import (init_unified_encoder,
                                                unified_encode)

            ucfg = self.unified_config
            if "unified_enc" not in self.params:
                self.params["unified_enc"] = init_unified_encoder(k1, ucfg)
                self.params["unified_proj"] = {"w": init.magneto_output_projection(
                    k2, (ucfg.hidden_dim, d))}

            def encode(params, x, _m=modality):
                z = unified_encode(params["unified_enc"], x, _m, ucfg)
                return layers.linear(params["unified_proj"], z,
                                     dtype=self.decoder.dtype)

            self._encoders[modality] = encode
            return
        if modality == "image":
            from kosmosx_tpu.nn.resampler import init_resampler, resampler
            from kosmosx_tpu.nn.vision import clip_vit, init_clip_vit

            vcfg, rcfg = self.configs["image"]
            self.params["image_enc"] = {
                "clip": init_clip_vit(k1, vcfg),
                "resampler": init_resampler(k2, rcfg)}
            self.params["image_proj"] = {"w": init.magneto_output_projection(
                k3, (rcfg.dim, d))}

            def encode(params, x):
                feats = clip_vit(params["image_enc"]["clip"], x, vcfg)
                lat = resampler(params["image_enc"]["resampler"], feats, rcfg)
                return layers.linear(params["image_proj"], lat[:, 0],
                                     dtype=self.decoder.dtype)

        elif modality == "audio":
            from kosmosx_tpu.nn.audio import audio_encoder, init_audio_encoder

            acfg = self.configs["audio"]
            self.params["audio_enc"] = init_audio_encoder(k1, acfg)
            self.params["audio_proj"] = {"w": init.magneto_output_projection(
                k2, (acfg.hidden_dim, d))}

            def encode(params, x):
                h = audio_encoder(params["audio_enc"], x, acfg)
                h = jnp.mean(h, axis=1, keepdims=True)
                return layers.linear(params["audio_proj"], h,
                                     dtype=self.decoder.dtype)

        elif modality == "video":
            from kosmosx_tpu.nn.video import init_video_encoder, video_encoder

            vcfg = self.configs["video"]
            self.params["video_enc"] = init_video_encoder(k1, vcfg)
            self.params["video_proj"] = {"w": init.magneto_output_projection(
                k2, (vcfg.hidden_dim, d))}

            def encode(params, x):
                h = video_encoder(params["video_enc"], x, vcfg)
                return layers.linear(params["video_proj"], h[:, None],
                                     dtype=self.decoder.dtype)

        else:  # "any": generic per-sample flat projection (reference <any>)
            if any_dim is None:
                raise ValueError(
                    "register_modality('any') needs any_dim= (the flattened "
                    "per-sample feature size) to shape its projection")
            key = f"any_proj_{any_dim}"
            if key not in self.params:
                self._key, kk = jax.random.split(self._key)
                self.params[key] = {"w": init.magneto_output_projection(
                    kk, (any_dim, d))}

            def encode(params, x):
                flat = x.reshape(x.shape[0], -1)
                pkey = f"any_proj_{flat.shape[-1]}"
                if pkey not in params:
                    raise KeyError(
                        f"'any' input of flattened dim {flat.shape[-1]} was "
                        f"never registered — call register_modality('any', "
                        f"any_dim={flat.shape[-1]}) first")
                return layers.linear(params[pkey], flat[:, None],
                                     dtype=self.decoder.dtype)

        self._encoders[modality] = encode

    # -- pure forward ---------------------------------------------------------
    def apply(self, params, text_tokens, media: Sequence[Tuple[str, Any]] = (),
              rng=None):
        """Pure forward: ``media`` is a sequence of (modality, processed_array)
        with every modality already registered. Jittable (modalities and
        shapes are static; arrays are traced) and trainable — grads flow to
        whatever ``params`` pytree is passed in."""
        dcfg = self.decoder
        blocks = []
        for modality, processed in media:
            if modality not in self._encoders:
                raise KeyError(f"modality {modality!r} not registered — call "
                               f"register_modality({modality!r}) first")
            blocks.append(self._encoders[modality](params, processed))

        text_emb = dec.embed_only(params["decoder"], dcfg, text_tokens)
        if blocks:
            mediacat = jnp.concatenate(blocks, axis=1).astype(text_emb.dtype)
            spliced = jnp.concatenate(
                [text_emb[:, :1], mediacat, text_emb[:, 1:]], axis=1)
        else:
            spliced = text_emb
        # Split the dropout key (embedding vs layers must decorrelate).
        rngs = list(jax.random.split(rng, 2)) if rng is not None else [None, None]
        x, _ = dec.forward_embedding(params["decoder"], dcfg,
                                     token_embedding=spliced, rng=rngs[0])
        h, _ = dec.run_layers(params["decoder"], x, dcfg, rng=rngs[1])
        return dec.output_logits(params["decoder"], h, dcfg)

    def prepare_media(self, media: Sequence[Tuple[str, Any]]):
        """Host-side step: detect + preprocess each item (concurrently, the
        reference kosmos3's ThreadPoolExecutor :327-357) and register its
        encoder (mutates ``self.params`` with any new towers — do this BEFORE
        jitting ``apply`` or capturing the pytree in a Trainer). Returns the
        (modality, processed) list ``apply`` consumes."""
        media = list(media)

        def _process(item):
            modality, data = item
            modality = modality or self.detector.detect(data)
            processed = self.processor.process(
                modality, data, image_size=self.configs["image"][0].image_size)
            return modality, processed

        if len(media) > 1:
            from concurrent.futures import ThreadPoolExecutor
            with ThreadPoolExecutor(max_workers=min(8, len(media))) as pool:
                prepared = list(pool.map(_process, media))
        else:
            prepared = [_process(item) for item in media]
        # Registration mutates self.params — keep it serial and ordered.
        for modality, processed in prepared:
            any_dim = None
            if modality not in ("image", "audio", "video"):
                any_dim = int(np.prod(processed.shape[1:]))
            self.register_modality(modality, any_dim=any_dim)
        return prepared

    def forward(self, text_tokens, media: Sequence[Tuple[str, Any]] = (),
                rng=None):
        """media: sequence of (modality-or-None, data) — modality inferred by
        the detector when None. Registers unseen modalities host-side, then
        runs the pure ``apply``. Returns logits over the spliced sequence."""
        prepared = self.prepare_media(media)
        return self.apply(self.params, jnp.asarray(text_tokens),
                          media=prepared, rng=rng)

    __call__ = forward

    @property
    def num_params(self) -> int:
        return sum(x.size for x in jax.tree_util.tree_leaves(self.params))
