"""Autoregressive generation with KV cache.

The reference has NO generation loop anywhere (SURVEY.md §1: torchscale's
``incremental_state`` support is never exercised) yet BASELINE.json config 5
demands "autoregressive generation with KV cache". This module provides it,
TPU-style:

- prefill: one jitted forward over the whole prompt that also writes the
  per-layer KV caches (static shapes, flash-attention-eligible);
- decode: a single ``lax.scan`` over steps — one compiled step regardless of
  ``max_new_tokens``; per-batch cache indices support ragged prompts;
- sampling: greedy / temperature / top-k / nucleus (top-p), fp32 logits.

For Kosmos, the multimodal prefix (vision tower + resampler + splice) runs
once in the prefill, then decode is pure text.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from kosmosx_tpu.core.config import KosmosConfig, MagnetoConfig
from kosmosx_tpu.data.splice import splice_embeddings
from kosmosx_tpu.nn import decoder as dec
from kosmosx_tpu.nn import layers


@dataclasses.dataclass(frozen=True)
class SamplingConfig:
    max_new_tokens: int = 64
    temperature: float = 1.0
    top_k: int = 0           # 0 = disabled
    top_p: float = 1.0       # 1.0 = disabled
    greedy: bool = False
    eos_id: Optional[int] = None


def sample_logits(logits: jax.Array, rng: jax.Array,
                  cfg: SamplingConfig,
                  rows=None) -> jax.Array:
    """logits (B, V) -> token ids (B,).

    Per-ROW overrides (serving: every request picks its own sampling):
    ``rows = (on, temps, top_ks, top_ps)`` with ``on`` (B,) bool selecting
    rows whose (temp, top-k, top-p) fully replace the static config
    (temp 0 = greedy; top_ks 0 = off; top_ps 1.0 = off; rows with ``on``
    False keep ``cfg``'s behavior). All static shapes: per-row top-k is a
    rank threshold against the row's k-th sorted logit, per-row top-p a
    cumulative-probability cutoff."""
    if rows is not None:
        on, t, ks, ps = rows
        base = sample_logits(logits, rng, cfg)
        l32 = logits.astype(jnp.float32)
        neg = -jnp.inf
        x = l32 / jnp.maximum(t, 1e-6)[:, None]
        v = x.shape[-1]
        # per-row top-k: keep logits >= the row's k-th largest
        sx = jnp.sort(x, axis=-1)[:, ::-1]
        kth = jnp.take_along_axis(
            sx, jnp.clip(ks - 1, 0, v - 1)[:, None], axis=-1)
        x = jnp.where((ks[:, None] > 0) & (x < kth), neg, x)
        # per-row top-p over the (top-k-filtered) distribution
        sx2 = jnp.sort(x, axis=-1)[:, ::-1]
        pr = jax.nn.softmax(sx2, axis=-1)
        cum = jnp.cumsum(pr, axis=-1)
        cidx = jnp.sum(cum < ps[:, None], axis=-1, keepdims=True)
        cutoff = jnp.take_along_axis(sx2, cidx, axis=-1)
        x = jnp.where((ps[:, None] < 1.0) & (x < cutoff), neg, x)
        sampled = jax.random.categorical(rng, x, axis=-1).astype(jnp.int32)
        greedy = jnp.argmax(l32, axis=-1).astype(jnp.int32)
        per_row = jnp.where(t <= 1e-6, greedy, sampled)
        return jnp.where(on, per_row, base)
    logits = logits.astype(jnp.float32)
    if cfg.greedy:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if cfg.temperature != 1.0:
        logits = logits / jnp.maximum(cfg.temperature, 1e-6)
    if cfg.top_k > 0:
        kth = jnp.sort(logits, axis=-1)[:, -cfg.top_k][:, None]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if cfg.top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep the smallest set with cumulative prob >= top_p
        cutoff_idx = jnp.sum(cum < cfg.top_p, axis=-1, keepdims=True)
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return jax.random.categorical(rng, logits, axis=-1).astype(jnp.int32)


def token_logprob(logits: jax.Array, tokens: jax.Array) -> jax.Array:
    """Raw-model log p(token): gathered logit minus logsumexp, fp32.
    logits (..., V), tokens (...) -> (...)."""
    l32 = logits.astype(jnp.float32)
    logz = jax.nn.logsumexp(l32, axis=-1)
    true = jnp.take_along_axis(l32, tokens[..., None], axis=-1)[..., 0]
    return true - logz


# ---------------------------------------------------------------------------
# text-only generation (KosmosLanguage)
# ---------------------------------------------------------------------------

def _prefill(params, cfg: MagnetoConfig, x, caches, prompt_lengths,
             segment_ids, interpret: bool = False):
    """Run the embedded prompt through the stack, writing KV caches."""
    idx0 = jnp.zeros_like(prompt_lengths)
    h, caches = dec.run_layers(params, x, cfg, segment_ids=segment_ids,
                               caches=caches, cache_index=idx0, prefill=True,
                               interpret=interpret)
    logits = dec.output_logits(params, h, cfg)
    # last real position per batch row
    last = jnp.take_along_axis(
        logits, (prompt_lengths - 1)[:, None, None], axis=1)[:, 0]
    return last, caches


def _decode_scan(params, cfg: MagnetoConfig, first_tokens, caches,
                 start_index, scfg: SamplingConfig, rng,
                 double_scale: bool = False, interpret: bool = False):
    """lax.scan decode loop: one step per new token.

    ``double_scale``: embed each step like a parity-mode Kosmos training
    forward (embed_scale applied twice, SURVEY.md §2.6.1) — otherwise decode
    tokens would arrive ~sqrt(d)x smaller than anything seen in training.
    """
    b = first_tokens.shape[0]

    # rolling-cache generation clamps positions past the learned table's
    # last usable row (StreamingLLM semantics: xPos carries relative order
    # exactly; the absolute table saturates)
    pos_cap = cfg.max_target_positions - 1
    # xPos re-centering keeps rolling-window generation numerically unbounded:
    # once a row's position runs this far past the decay center, every cached
    # key is rescaled to the new center (dec.recenter_caches) — exact in the
    # q.k product, so outputs match the fixed-center math while the per-dim
    # scales stay in range forever (VERDICT r2 weak #8).
    recenter = cfg.kv_window > 0 and cfg.xpos_rel_pos
    recenter_every = 8 * cfg.xpos_scale_base

    def step(carry, step_rng):
        tokens, caches, index, center, done = carry
        if recenter:
            def do_recenter(args):
                cs, _ = args
                return dec.recenter_caches(cs, index - center, cfg), index

            caches, center = jax.lax.cond(
                jnp.any(index - center >= recenter_every),
                do_recenter, lambda args: args, (caches, center))
        off = (jnp.minimum(index, pos_cap) if cfg.kv_window > 0
               else index)
        if double_scale:
            emb = dec.embed_only(params, cfg, tokens[:, None])
            x, _ = dec.forward_embedding(params, cfg, token_embedding=emb,
                                         offset=off[:, None])
        else:
            x, _ = dec.forward_embedding(params, cfg, tokens[:, None],
                                         offset=off[:, None])
        h, caches = dec.run_layers(params, x, cfg, caches=caches,
                                   cache_index=index, interpret=interpret,
                                   xpos_center=center if recenter else None)
        logits = dec.output_logits(params, h, cfg)[:, 0]
        nxt = sample_logits(logits, step_rng, scfg)
        if scfg.eos_id is not None:
            nxt = jnp.where(done, scfg.eos_id, nxt)
            done = done | (nxt == scfg.eos_id)
        return (nxt, caches, index + 1, center, done), nxt

    done0 = (first_tokens == scfg.eos_id if scfg.eos_id is not None
             else jnp.zeros((b,), bool))
    center0 = jnp.zeros((b,), jnp.int32)  # prefill wrote keys at center 0
    rngs = jax.random.split(rng, scfg.max_new_tokens)
    # Unstack the cache into per-layer buffers so run_layers takes the
    # unrolled loop (one-time copy here, outside the token scan; 1.3-2.1x
    # faster steps — nn/decoder.wants_unrolled_decode). Restacked for callers;
    # XLA dead-code-eliminates the restack when the caches go unused.
    unroll = dec.wants_unrolled_decode(cfg, caches)
    if unroll:
        caches = dec.unstack_caches(caches, cfg)
    (_, caches, _, _, _), toks = jax.lax.scan(
        step, (first_tokens, caches, start_index, center0, done0), rngs)
    if unroll:
        caches = dec.stack_caches(caches)
    return jnp.swapaxes(toks, 0, 1), caches  # (B, T)


@functools.partial(jax.jit, static_argnames=("cfg", "scfg", "max_len",
                                              "interpret"))
def _generate_text_jit(params, prompt, prompt_lengths, rng,
                       cfg: MagnetoConfig, scfg: SamplingConfig, max_len: int,
                       interpret: bool = False):
    b, lp = prompt.shape
    if cfg.kv_window > 0:
        max_len = min(max_len, cfg.kv_window)  # O(window) memory
    caches = dec.init_cache(cfg, batch=b, max_len=max_len)
    seg = jnp.where(jnp.arange(lp)[None, :] < prompt_lengths[:, None], 0, -1
                    ).astype(jnp.int32)
    x, _ = dec.forward_embedding(params, cfg, prompt)
    last_logits, caches = _prefill(params, cfg, x, caches, prompt_lengths, seg,
                                   interpret=interpret)
    rng, r0 = jax.random.split(rng)
    first = sample_logits(last_logits, r0, scfg)
    out, _ = _decode_scan(params, cfg, first, caches, prompt_lengths, scfg,
                          rng, interpret=interpret)
    return jnp.concatenate([first[:, None], out[:, :-1]], axis=1)


def generate_text(params, cfg: MagnetoConfig, prompt: jax.Array,
                  sampling: Optional[SamplingConfig] = None,
                  prompt_lengths: Optional[jax.Array] = None,
                  rng: Optional[jax.Array] = None,
                  interpret: bool = False) -> jax.Array:
    """prompt (B, Lp) -> generated ids (B, max_new_tokens)."""
    sampling = sampling or SamplingConfig()
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    b, lp = prompt.shape
    if prompt_lengths is None:
        prompt_lengths = jnp.full((b,), lp, jnp.int32)
    max_len = lp + sampling.max_new_tokens
    if cfg.kv_window > 0:
        # rolling cache: generation length is UNBOUNDED — the decode loop
        # slides the xPos decay center every 8*scale_base steps
        # (dec.recenter_caches), so positions never leave the numeric range.
        # The PROMPT must fit the window (prefill is a single un-wrapped
        # write) and the table (prefill positions are not clamped).
        from kosmosx_tpu.nn.xpos import xpos_position_bound

        if cfg.kv_sink >= cfg.kv_window:
            raise ValueError(f"kv_sink ({cfg.kv_sink}) must be < kv_window "
                             f"({cfg.kv_window})")
        if lp > cfg.kv_window:
            raise ValueError(f"prompt ({lp}) exceeds kv_window "
                             f"({cfg.kv_window})")
        if lp > cfg.max_target_positions:
            raise ValueError(f"prompt ({lp}) exceeds the learned position "
                             f"table ({cfg.max_target_positions})")
        if cfg.xpos_rel_pos:
            # with re-centering, the largest |pos - center| ever rotated or
            # held in the cache is window + recenter interval
            bound = xpos_position_bound(cfg.xpos_scale_base)
            reach = cfg.kv_window + 8 * cfg.xpos_scale_base
            if reach > bound:
                raise ValueError(
                    f"kv_window ({cfg.kv_window}) + re-center interval "
                    f"({8 * cfg.xpos_scale_base}) exceeds the xPos numeric "
                    f"range bound ({bound} at scale_base "
                    f"{cfg.xpos_scale_base}); raise xpos_scale_base or "
                    f"shrink the window")
    elif max_len > cfg.max_target_positions:
        # decode offsets are traced, so the positional table cannot catch
        # this itself (it would silently clamp); validate the static bound
        raise ValueError(
            f"prompt ({lp}) + max_new_tokens ({sampling.max_new_tokens}) = "
            f"{max_len} exceeds the learned position table "
            f"(max usable length {cfg.max_target_positions}); raise "
            f"max_positions")
    return _generate_text_jit(params, prompt, prompt_lengths, rng, cfg,
                              sampling, max_len, interpret)


# ---------------------------------------------------------------------------
# multimodal generation (Kosmos)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("kcfg", "scfg", "max_len",
                                              "interpret"))
def _generate_mm_jit(params, text_tokens, images, prompt_lengths, rng,
                     kcfg: KosmosConfig, scfg: SamplingConfig, max_len: int,
                     interpret: bool = False):
    from kosmosx_tpu.models.kosmos import Kosmos

    dcfg = kcfg.decoder
    b, lt = text_tokens.shape
    k = kcfg.image_embed_len

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
    # ALL image blocks count as prompt (the spliced length is lt + M*k)
    full_lengths = prompt_lengths + num_images * k
    seg = jnp.where(jnp.arange(lp)[None, :] < full_lengths[:, None], 0, -1
                    ).astype(jnp.int32)
    caches = dec.init_cache(dcfg, batch=b, max_len=max_len)
    last_logits, caches = _prefill(params["decoder"], dcfg, x, caches,
                                   full_lengths, seg, interpret=interpret)
    rng, r0 = jax.random.split(rng)
    first = sample_logits(last_logits, r0, scfg)
    # decode embeds must match the training-forward scale arithmetic
    out, _ = _decode_scan(params["decoder"], dcfg, first, caches,
                          full_lengths, scfg, rng,
                          double_scale=kcfg.parity_double_scale,
                          interpret=interpret)
    return jnp.concatenate([first[:, None], out[:, :-1]], axis=1)


def generate_multimodal(params, kcfg: KosmosConfig, text_tokens: jax.Array,
                        images: jax.Array,
                        sampling: Optional[SamplingConfig] = None,
                        prompt_lengths: Optional[jax.Array] = None,
                        rng: Optional[jax.Array] = None,
                        interpret: bool = False) -> jax.Array:
    """Kosmos generation: encode image(s) + text prompt once, then decode."""
    sampling = sampling or SamplingConfig()
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    if kcfg.decoder.kv_window > 0:
        raise NotImplementedError(
            "multimodal generation over a rolling KV window is not "
            "implemented (generate_text supports kv_window)")
    b, lt = text_tokens.shape
    if prompt_lengths is None:
        prompt_lengths = jnp.full((b,), lt, jnp.int32)
    num_images = images.shape[1] if images.ndim == 5 else 1
    max_len = lt + num_images * kcfg.image_embed_len + sampling.max_new_tokens
    if max_len > kcfg.decoder.max_target_positions:
        raise ValueError(
            f"text ({lt}) + image embeds ({num_images * kcfg.image_embed_len})"
            f" + max_new_tokens ({sampling.max_new_tokens}) = {max_len} "
            f"exceeds the learned position table (max usable length "
            f"{kcfg.decoder.max_target_positions}); raise max_positions")
    return _generate_mm_jit(params, text_tokens, images, prompt_lengths, rng,
                            kcfg, sampling, max_len, interpret)
