"""Beam-search decoding over the KV cache.

Capability beyond the reference (it has no generation loop at all —
SURVEY.md §1: torchscale's ``incremental_state`` is never exercised).
TPU-native design: one jitted ``lax.scan`` whose carry holds the flattened
(B*K) beam cache; every step is top-k over (K·V) candidates + a beam-parent
gather of the cache — all static shapes, one compile per (beam, length).

EOS semantics: a finished beam is frozen — its only continuation is EOS at
zero added log-probability — and final scores are normalized by generated
length ``score / len**length_penalty`` before the beams are sorted.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from kosmosx_tpu.core.config import MagnetoConfig
from kosmosx_tpu.generate.sampler import _prefill
from kosmosx_tpu.nn import decoder as dec


def _beam_axis(leaf) -> int:
    """Batch axis of a cache leaf: stacked scan caches are (L,B,H,S,hd|1),
    per-layer lists are (B,H,S,hd|1) — same convention as the serving
    engine's _insert_slot_jit."""
    return 1 if leaf.ndim == 5 else 0


def _repeat_cache(caches, k: int):
    return jax.tree_util.tree_map(
        lambda x: jnp.repeat(x, k, axis=_beam_axis(x)), caches)


def _gather_cache(caches, flat_parent):
    return jax.tree_util.tree_map(
        lambda x: jnp.take(x, flat_parent, axis=_beam_axis(x)), caches)


def _beam_from_logits(params, last_logits, caches, start_index,
                      cfg: MagnetoConfig, beam: int, new_tokens: int,
                      length_penalty: float, eos_id: Optional[int],
                      double_scale: bool, interpret: bool):
    """Beam scan from a finished prefill: ``last_logits`` (B, V) at the
    prompt boundary, batch-B ``caches``, ``start_index`` (B,) = cached
    length per row. Shared by the text and multimodal entry points."""
    b = last_logits.shape[0]
    v = cfg.vocab_size
    neg = jnp.finfo(jnp.float32).min
    # per-layer buffers for the unrolled decode loop (one-time unstack
    # outside the beam scan; the caches are not returned, so no restack) —
    # _beam_axis/_repeat_cache/_gather_cache handle both layouts
    if dec.wants_unrolled_decode(cfg, caches):
        caches = dec.unstack_caches(caches, cfg)
    caches = _repeat_cache(caches, beam)

    logp0 = jax.nn.log_softmax(last_logits.astype(jnp.float32), axis=-1)
    scores, first = jax.lax.top_k(logp0, beam)            # (B, K)
    first = first.astype(jnp.int32)
    tokens = jnp.full((b, beam, new_tokens), cfg.padding_idx, jnp.int32)
    tokens = tokens.at[:, :, 0].set(first)
    finished = (first == eos_id) if eos_id is not None else \
        jnp.zeros((b, beam), bool)
    gen_len = jnp.ones((b, beam), jnp.int32)
    index = jnp.repeat(start_index, beam)                 # (B*K,)
    last = first

    # a frozen beam may only continue with EOS (cost 0) — one copy survives
    eos_row = jnp.full((v,), neg, jnp.float32)
    if eos_id is not None:
        eos_row = eos_row.at[eos_id].set(0.0)

    def step(carry, t):
        last, caches, index, scores, tokens, finished, gen_len = carry
        flat_last = last.reshape(b * beam)
        if double_scale:
            emb = dec.embed_only(params, cfg, flat_last[:, None])
            x, _ = dec.forward_embedding(params, cfg, token_embedding=emb,
                                         offset=index[:, None])
        else:
            x, _ = dec.forward_embedding(params, cfg, flat_last[:, None],
                                         offset=index[:, None])
        h, caches = dec.run_layers(params, x, cfg, caches=caches,
                                   cache_index=index, interpret=interpret)
        logits = dec.output_logits(params, h, cfg)[:, 0]
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1
                                  ).reshape(b, beam, v)
        logp = jnp.where(finished[:, :, None], eos_row[None, None, :], logp)
        cand = (scores[:, :, None] + logp).reshape(b, beam * v)
        scores, idx = jax.lax.top_k(cand, beam)           # (B, K)
        parent = idx // v                                  # (B, K)
        tok = (idx % v).astype(jnp.int32)

        flat_parent = (jnp.arange(b)[:, None] * beam + parent).reshape(-1)
        caches = _gather_cache(caches, flat_parent)
        index = jnp.take(index, flat_parent) + 1
        tokens = jnp.take_along_axis(tokens, parent[:, :, None], axis=1)
        finished_parent = jnp.take_along_axis(finished, parent, axis=1)
        gen_len = jnp.take_along_axis(gen_len, parent, axis=1) \
            + (~finished_parent).astype(jnp.int32)
        finished = finished_parent | ((tok == eos_id) if eos_id is not None
                                      else False)
        # write this step's token into the parent-gathered buffer: the
        # buffer rides the carry and is re-gathered by parent every step,
        # so position t always reflects the FINAL lineage of each beam
        tokens = jax.lax.dynamic_update_index_in_dim(
            tokens, tok, t, axis=2)
        return (tok, caches, index, scores, tokens, finished, gen_len), None

    carry = (last, caches, index, scores, tokens, finished, gen_len)
    carry, _ = jax.lax.scan(step, carry, jnp.arange(1, new_tokens))
    _, _, _, scores, tokens, finished, gen_len = carry
    norm = scores / (gen_len.astype(jnp.float32) ** length_penalty)
    order = jnp.argsort(-norm, axis=1)
    tokens = jnp.take_along_axis(tokens, order[:, :, None], axis=1)
    norm = jnp.take_along_axis(norm, order, axis=1)
    scores = jnp.take_along_axis(scores, order, axis=1)
    gen_len = jnp.take_along_axis(gen_len, order, axis=1)
    return tokens, norm, scores, gen_len


@functools.partial(jax.jit, static_argnames=("cfg", "beam", "new_tokens",
                                             "max_len", "length_penalty",
                                             "eos_id", "double_scale",
                                             "interpret"))
def _beam_search_jit(params, prompt, prompt_lengths, cfg: MagnetoConfig,
                     beam: int, new_tokens: int, max_len: int,
                     length_penalty: float = 1.0,
                     eos_id: Optional[int] = None,
                     double_scale: bool = False,
                     interpret: bool = False):
    b, lp = prompt.shape

    # prefill once at batch B, then expand the cache to B*K beams
    caches = dec.init_cache(cfg, batch=b, max_len=max_len)
    seg = jnp.where(jnp.arange(lp)[None, :] < prompt_lengths[:, None], 0, -1
                    ).astype(jnp.int32)
    if double_scale:
        emb = dec.embed_only(params, cfg, prompt)
        x, _ = dec.forward_embedding(params, cfg, token_embedding=emb)
    else:
        x, _ = dec.forward_embedding(params, cfg, prompt)
    last_logits, caches = _prefill(params, cfg, x, caches, prompt_lengths,
                                   seg, interpret=interpret)
    return _beam_from_logits(params, last_logits, caches, prompt_lengths,
                             cfg, beam, new_tokens, length_penalty, eos_id,
                             double_scale, interpret)


@functools.partial(jax.jit, static_argnames=("kcfg", "beam", "new_tokens",
                                             "max_len", "length_penalty",
                                             "eos_id"))
def _beam_search_mm_jit(params, text_tokens, images, prompt_lengths,
                        kcfg, beam: int, new_tokens: int, max_len: int,
                        length_penalty: float = 1.0,
                        eos_id: Optional[int] = None):
    """Multimodal beam search: Kosmos prefill (vision tower + resampler +
    splice, mirrors sampler._generate_mm_jit) then the shared beam scan —
    decode embeds follow the parity double-scale convention."""
    from kosmosx_tpu.data.splice import splice_embeddings
    from kosmosx_tpu.models.kosmos import Kosmos
    from kosmosx_tpu.nn import layers

    dcfg = kcfg.decoder
    b, lt = text_tokens.shape
    img = Kosmos.encode_images(params, images, kcfg)
    num_images = img.shape[1] if img.ndim == 4 else 1
    text_emb = dec.embed_only(params["decoder"], dcfg, text_tokens)
    spliced = splice_embeddings(text_emb, img, None, index=kcfg.splice_index)
    if kcfg.parity_double_scale:
        x, _ = dec.forward_embedding(params["decoder"], dcfg,
                                     token_embedding=spliced)
    else:
        pos = layers.positional_embedding(
            params["decoder"]["pos"], spliced.shape[1],
            padding_idx=dcfg.padding_idx, dtype=dcfg.dtype)
        x = spliced + pos
    lp = spliced.shape[1]
    full_lengths = prompt_lengths + num_images * kcfg.image_embed_len
    seg = jnp.where(jnp.arange(lp)[None, :] < full_lengths[:, None], 0, -1
                    ).astype(jnp.int32)
    caches = dec.init_cache(dcfg, batch=b, max_len=max_len)
    last_logits, caches = _prefill(params["decoder"], dcfg, x, caches,
                                   full_lengths, seg)
    return _beam_from_logits(params["decoder"], last_logits, caches,
                             full_lengths, dcfg, beam, new_tokens,
                             length_penalty, eos_id,
                             kcfg.parity_double_scale, False)


def beam_search(params, cfg: MagnetoConfig, prompt: jax.Array, *,
                beam_size: int = 4, max_new_tokens: int = 32,
                length_penalty: float = 1.0, eos_id: Optional[int] = None,
                prompt_lengths: Optional[jax.Array] = None,
                double_scale: bool = False,
                interpret: bool = False
                ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """prompt (B, Lp) -> (tokens (B, K, T), normalized scores (B, K),
    raw log-probs (B, K)); beams sorted best-first. ``tokens[:, 0]`` is the
    best sequence; positions after EOS hold repeated EOS."""
    if beam_size < 1:
        raise ValueError("beam_size must be >= 1")
    if cfg.kv_window > 0:
        raise NotImplementedError(
            "beam search over a rolling KV window is not implemented "
            "(generate_text supports kv_window)")
    b, lp = prompt.shape
    if prompt_lengths is None:
        prompt_lengths = jnp.full((b,), lp, jnp.int32)
    max_len = lp + max_new_tokens
    if max_len > cfg.max_target_positions:
        raise ValueError(
            f"prompt ({lp}) + max_new_tokens ({max_new_tokens}) = {max_len} "
            f"exceeds the learned position table (max usable length "
            f"{cfg.max_target_positions}); raise max_positions")
    tokens, norm, scores, _ = _beam_search_jit(
        params, prompt, prompt_lengths, cfg, beam_size, max_new_tokens,
        max_len, length_penalty=length_penalty, eos_id=eos_id,
        double_scale=double_scale, interpret=interpret)
    return tokens, norm, scores


def beam_search_multimodal(params, kcfg, text_tokens: jax.Array,
                           images: jax.Array, *,
                           beam_size: int = 4, max_new_tokens: int = 32,
                           length_penalty: float = 1.0,
                           eos_id: Optional[int] = None,
                           prompt_lengths: Optional[jax.Array] = None
                           ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Kosmos beam search: encode image(s) + text prompt once, then beam
    decode. Same return contract as :func:`beam_search`."""
    if beam_size < 1:
        raise ValueError("beam_size must be >= 1")
    if kcfg.decoder.kv_window > 0:
        raise NotImplementedError(
            "beam search over a rolling KV window is not implemented")
    b, lt = text_tokens.shape
    if prompt_lengths is None:
        prompt_lengths = jnp.full((b,), lt, jnp.int32)
    num_images = images.shape[1] if images.ndim == 5 else 1
    max_len = lt + num_images * kcfg.image_embed_len + max_new_tokens
    if max_len > kcfg.decoder.max_target_positions:
        raise ValueError(
            f"text ({lt}) + image embeds "
            f"({num_images * kcfg.image_embed_len}) + max_new_tokens "
            f"({max_new_tokens}) = {max_len} exceeds the learned position "
            f"table (max usable length {kcfg.decoder.max_target_positions})")
    tokens, norm, scores, _ = _beam_search_mm_jit(
        params, text_tokens, images, prompt_lengths, kcfg, beam_size,
        max_new_tokens, max_len, length_penalty=length_penalty,
        eos_id=eos_id)
    return tokens, norm, scores
