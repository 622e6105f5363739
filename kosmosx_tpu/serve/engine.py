"""Continuous-batching serving engine (slot-based KV cache).

The reference ships NO serving/inference layer at all (SURVEY.md §1: no
``serve()``, no generation loop, no KV cache use anywhere; torchscale's
``incremental_state`` is never exercised). This module goes beyond parity
and provides a production-shaped serving path, designed TPU-first:

- ALL device state has static shapes: a fixed pool of ``max_batch`` decode
  slots over one stacked KV cache, prompts padded to ``max_prompt_len`` —
  so exactly two programs are compiled (one prefill, one decode step) no
  matter how requests arrive;
- decode advances every active slot one token per step in a single jitted
  call (continuous batching: new requests are admitted into free slots
  between steps, without disturbing in-flight ones);
- admission = batch-1 prefill + a jitted cache insert
  (``dynamic_update_index_in_dim`` into the slot axis);
- per-slot cache indices make ragged prompts/generation lengths exact: a
  slot's stale cache contents past its index are never attended to.

EOS detection and request bookkeeping run on the host (the per-step token
fetch is required to stream tokens out anyway), but the decode feedback loop
never leaves the device, so ``ServeConfig.sync_lag`` lets the host's token
reads pipeline K steps behind the device — hiding the device->host link
latency behind compute at the cost of K-step-late EOS reaction (trailing
speculative tokens are discarded), and ``ServeConfig.decode_block`` runs K
decode steps per dispatch to amortize the dispatch overhead itself.
Measured on the flagship (BASELINE.md): 186 tok/s synchronous -> 589 at
sync_lag=4 -> 680 at sync_lag=4 + decode_block=4 -> 819 with W8 weights +
int8 KV cache on top (90% of the no-streaming decode ceiling).
"""

from __future__ import annotations

import dataclasses
import functools
from collections import OrderedDict, deque
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

from kosmosx_tpu.core.config import KosmosConfig, MagnetoConfig
from kosmosx_tpu.generate.sampler import (SamplingConfig, _prefill,
                                           sample_logits, token_logprob)
from kosmosx_tpu.nn import decoder as dec
from kosmosx_tpu.nn import layers


@dataclasses.dataclass(frozen=True)
class ServeConfig:
    max_batch: int = 8          # concurrent decode slots
    max_prompt_len: int = 128   # prompts are padded to this (static shape)
    max_len: int = 256          # KV-cache length (prompt + generated bound)
    pad_id: int = 1             # feed for inactive slots
    # How many decode steps the HOST may lag behind the device when reading
    # sampled tokens. 0 = read every step (EOS reacts immediately; one
    # blocking device->host fetch per token). K>0 = the device free-runs —
    # its token feedback loop lives on device — while token reads pipeline
    # K-deep, hiding the host link latency behind compute; EOS/budget
    # detection lags K steps, so a finishing request decodes up to K
    # discarded tokens and its slot frees K steps late. On a remote-device
    # link (measured: ~36 ms fetch vs ~9 ms compute) this takes the step
    # from RTT-bound to compute-bound.
    sync_lag: int = 0
    # Speculative decoding: when > 0 (and the engine is built with
    # draft_params/draft_cfg), every engine step runs one speculative round
    # — the draft proposes spec_gamma tokens per slot, the target verifies
    # them in ONE chunked forward, and each active slot commits 1..gamma+1
    # tokens per step. Multimodal slots work too: the draft proposes from
    # TOKENS alone (its cache index lags the target's by the image-embed
    # count); the target's verify forward carries the image context, so
    # correctness is unchanged — only the acceptance rate depends on how
    # image-dependent the continuation is.
    spec_gamma: int = 0
    # Decode blocking: when > 1, every engine step runs decode_block decode
    # steps in ONE device dispatch (lax.scan inside the jit, token feedback
    # on device) and reads back (B, decode_block) tokens. Amortizes the
    # per-dispatch overhead (~3 ms on the remote link vs a ~7-10 ms
    # flagship step) the same way sync_lag amortizes the READ latency; the
    # two compose. Budget exhaustion reacts immediately (the host clamps
    # dispatch when a slot's known budget is reached; overrun is at most
    # block-1 tokens from the final partial block), but EOS — which the
    # host cannot predict — is detected up to (sync_lag+1)*decode_block
    # tokens late (overrun discarded, the slot frees late). Admission
    # waits for a step boundary. Greedy outputs are identical to the
    # per-token engine. With spec_gamma > 0, decode_block scans K
    # SPECULATIVE ROUNDS per dispatch instead (the spec engine is
    # host-pipeline-bound at small sync_lag, so amortizing the dispatch
    # cadence raises throughput; overrun grows to
    # (sync_lag+1)*(gamma+1)*block).
    decode_block: int = 0
    # Chunked prefill: when > 0, request admission does NO full-prompt
    # prefill up front; the engine ingests the prompt prefill_chunk tokens
    # per step through a pooled multi-token cached forward, interleaved
    # with the decode steps of in-flight slots. Multimodal admissions run
    # the vision tower + a spliced-prefix prefill once (splice_index tokens
    # + image embeds), then their text remainder joins the chunk stream.
    # Bounds the admission stall to one chunk per step instead of one full
    # prompt.
    prefill_chunk: int = 0
    # Admission prefill buckets: batch-1 prefills pad the prompt to the
    # smallest listed bucket >= its length instead of always to
    # max_prompt_len — prefill FLOPs scale with the bucket, so short
    # prompts admit proportionally faster. Each bucket compiles one extra
    # prefill program (expensive on a remote chip: opt in deliberately).
    # () = always pad to max_prompt_len.
    prompt_buckets: tuple = ()
    # Prefix caching: max number of prefixes held by register_prefix()
    # (LRU). A registered prefix's KV cache is computed once; any text
    # request whose prompt starts with it is admitted by copying the cached
    # K/V into its slot and prefilling only the remainder — the serving
    # answer to shared system prompts / few-shot headers. Greedy outputs
    # are identical to full prefill (same cache contents, same positions).
    prefix_cache_size: int = 8

    @property
    def overrun_window(self) -> int:
        """Cache positions a slot can touch past its budget (worst-case
        EOS/speculative overrun). size max_len >= prompt + image embeds +
        max_new_tokens + this. Single source of truth for the engine's
        submit() guard and the benchmarks' max_len sizing."""
        if self.spec_gamma > 0:
            return ((self.sync_lag + 1) * (self.spec_gamma + 1)
                    * max(self.decode_block, 1))
        return (self.sync_lag + 1) * max(self.decode_block, 1) - 1


@dataclasses.dataclass
class Request:
    prompt: Any                  # (Lp,) int32 token ids (list or array)
    max_new_tokens: int = 64
    eos_id: Optional[int] = None
    images: Any = None           # optional (M, 3, H, W) for multimodal
    adapter: Optional[str] = None  # LoRA adapter name (load_adapter)
    # per-request sampling overrides: when ANY is set, this request's row
    # fully replaces the engine SamplingConfig (temp 0 = greedy; top_k 0 =
    # off; top_p 1.0 = off; unset fields default to 1.0 / 0 / 1.0)
    temperature: Optional[float] = None
    top_k: Optional[int] = None
    top_p: Optional[float] = None
    # filled by the engine:
    id: int = -1
    tokens: List[int] = dataclasses.field(default_factory=list)
    logprobs: List[float] = dataclasses.field(default_factory=list)
    done: bool = False


# ---------------------------------------------------------------------------
# jitted pieces (static cfg; compiled once per engine)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg", "scfg", "max_len",
                                             "double_scale", "interpret"))
def _prefill_one_jit(params, prompt, length, rng, cfg: MagnetoConfig,
                     scfg: SamplingConfig, max_len: int,
                     double_scale: bool = False, interpret: bool = False,
                     rows=None):
    """prompt (1, P) -> (first_token (1,), batch-1 caches).

    ``double_scale`` must match the engine's decode convention (the Kosmos
    parity quirk) or the prompt and the decoded tokens are embedded at
    different scales."""
    caches = dec.init_cache(cfg, batch=1, max_len=max_len)
    lp = prompt.shape[1]
    seg = jnp.where(jnp.arange(lp)[None, :] < length[:, None], 0, -1
                    ).astype(jnp.int32)
    if double_scale:
        emb = dec.embed_only(params, cfg, prompt)
        x, _ = dec.forward_embedding(params, cfg, token_embedding=emb)
    else:
        x, _ = dec.forward_embedding(params, cfg, prompt)
    last_logits, caches = _prefill(params, cfg, x, caches, length, seg,
                                   interpret=interpret)
    first = sample_logits(last_logits, rng, scfg, rows=rows)
    return first, token_logprob(last_logits, first), caches


@functools.partial(jax.jit, static_argnames=("kcfg", "scfg", "max_len"))
def _prefill_mm_one_jit(params, prompt, images, length, rng,
                        kcfg: KosmosConfig, scfg: SamplingConfig,
                        max_len: int, rows=None):
    """Multimodal admission: encode image(s), splice, prefill (batch 1).
    Returns (first_token (1,), caches, spliced_length (1,))."""
    from kosmosx_tpu.data.splice import splice_embeddings
    from kosmosx_tpu.models.kosmos import Kosmos

    dcfg = kcfg.decoder
    img = Kosmos.encode_images(params, images, kcfg)
    num_images = img.shape[1] if img.ndim == 4 else 1
    text_emb = dec.embed_only(params["decoder"], dcfg, prompt)
    spliced = splice_embeddings(text_emb, img, None, index=kcfg.splice_index)
    if kcfg.parity_double_scale:
        x, _ = dec.forward_embedding(params["decoder"], dcfg,
                                     token_embedding=spliced)
    else:
        pos = layers.positional_embedding(
            params["decoder"]["pos"], spliced.shape[1],
            padding_idx=dcfg.padding_idx, dtype=dcfg.dtype)
        x = spliced + pos
    full_length = length + num_images * kcfg.image_embed_len
    lp = spliced.shape[1]
    seg = jnp.where(jnp.arange(lp)[None, :] < full_length[:, None], 0, -1
                    ).astype(jnp.int32)
    caches = dec.init_cache(dcfg, batch=1, max_len=max_len)
    last_logits, caches = _prefill(params["decoder"], dcfg, x, caches,
                                   full_length, seg)
    first = sample_logits(last_logits, rng, scfg, rows=rows)
    return first, token_logprob(last_logits, first), caches, full_length


@functools.partial(jax.jit, static_argnames=("kcfg", "max_len"))
def _prefill_mm_prefix_jit(params, prefix, images, kcfg: KosmosConfig,
                           max_len: int):
    """Chunked multimodal admission, step 1 of 2: run the vision tower ONCE
    and prefill only the spliced PREFIX — ``splice_index`` text tokens
    followed by the image embeddings. The text remainder then streams
    through the pooled chunked path (``_prefill_chunk_pool_jit``)
    interleaved with other slots' decode steps, so a long multimodal prompt
    never stalls the pool behind a whole-prompt prefill.

    prefix (1, splice_index) int32; images (1, [M,] 3, H, W).
    Returns (batch-1 caches, cached length = splice_index + M*K).
    """
    from kosmosx_tpu.models.kosmos import Kosmos

    dcfg = kcfg.decoder
    img = Kosmos.encode_images(params, images, kcfg)   # (1, [M,] K, D)
    if img.ndim == 4:
        img = img.reshape(1, -1, img.shape[-1])        # (1, M*K, D)
    text_emb = dec.embed_only(params["decoder"], dcfg, prefix)
    spliced = jnp.concatenate([text_emb, img.astype(text_emb.dtype)], axis=1)
    if kcfg.parity_double_scale:
        x, _ = dec.forward_embedding(params["decoder"], dcfg,
                                     token_embedding=spliced)
    else:
        pos = layers.positional_embedding(
            params["decoder"]["pos"], spliced.shape[1],
            padding_idx=dcfg.padding_idx, dtype=dcfg.dtype)
        x = spliced + pos
    lp = spliced.shape[1]
    length = jnp.asarray([lp], jnp.int32)
    seg = jnp.zeros((1, lp), jnp.int32)
    caches = dec.init_cache(dcfg, batch=1, max_len=max_len)
    _, caches = _prefill(params["decoder"], dcfg, x, caches, length, seg)
    return caches, length


def _trim_shared(caches_one, length: int, dtype):
    """Batch-1 caches -> read-only shared segment: trim the positions axis
    to the prefix length and dequantize int8 storage (the segment is tiny
    and read every step by every slot — bf16 is the right format)."""

    def trim(x):
        return x[..., :length, :]

    def conv(tree):
        if isinstance(tree, dict) and "k_scale" in tree:
            k = (tree["k"].astype(jnp.float32) * tree["k_scale"])
            v = (tree["v"].astype(jnp.float32) * tree["v_scale"])
            return {"k": trim(k.astype(dtype)), "v": trim(v.astype(dtype))}
        if isinstance(tree, dict):
            return {"k": trim(tree["k"]), "v": trim(tree["v"])}
        return [conv(t) for t in tree]

    return jax.jit(conv)(caches_one)


@functools.partial(jax.jit, donate_argnums=(0,))
def _insert_slot_jit(caches, caches_one, slot):
    """Write a batch-1 cache into slot ``slot`` of the pooled cache.

    ``slot`` is traced (one compiled program serves every slot) and the pool
    is donated (in-place update instead of a full pooled-cache copy)."""

    def ins(pool, one):
        axis = 1 if pool.ndim == 5 else 0  # stacked (L,B,H,S,hd) vs (B,H,S,hd)
        return jax.lax.dynamic_update_index_in_dim(
            pool, jnp.take(one, 0, axis=axis), slot, axis)

    return jax.tree_util.tree_map(ins, caches, caches_one)


def _decode_core(params, last_tokens, caches, index, active, rng,
                 cfg: MagnetoConfig, scfg: SamplingConfig,
                 pad_id: int = 1, double_scale: bool = False,
                 shared=None, rows=None, interpret: bool = False):
    """One decode step for every slot. Inactive slots still compute (static
    shapes) but their index does not advance and their token is ignored.

    ``shared = (shared_caches, shared_on, pos_offset)``: the engine's
    shared-prefix segment (see ServeEngine.register_prefix(share=True)) —
    flagged slots attend it in place of per-slot prefix cache copies and
    their positions shift by its length."""
    # inactive slots feed pad (their ``last`` may hold a stale sampled token
    # — the engine keeps ``last`` on device to avoid a host→device RTT/step)
    last_tokens = jnp.where(active, last_tokens, pad_id)
    shared_caches, shared_on, pos_offset = shared or (None, None, None)
    pos = index if pos_offset is None else index + pos_offset
    if cfg.kv_window > 0:
        # rolling-window serving: learned-table positions clamp at the last
        # usable row past the table edge (jnp.take would fill NaN); xPos
        # rotation inside attention keeps the true absolute index
        pos = jnp.minimum(pos, cfg.max_target_positions - 1)
    if double_scale:
        emb = dec.embed_only(params, cfg, last_tokens[:, None])
        x, _ = dec.forward_embedding(params, cfg, token_embedding=emb,
                                     offset=pos[:, None])
    else:
        x, _ = dec.forward_embedding(params, cfg, last_tokens[:, None],
                                     offset=pos[:, None])
    h, caches = dec.run_layers(params, x, cfg, caches=caches,
                               cache_index=index,
                               shared_caches=shared_caches,
                               shared_on=shared_on, pos_offset=pos_offset,
                               interpret=interpret)
    logits = dec.output_logits(params, h, cfg)[:, 0]
    nxt = sample_logits(logits, rng, scfg, rows=rows)
    index = index + active.astype(index.dtype)
    return nxt, token_logprob(logits, nxt), caches, index


@functools.partial(jax.jit, static_argnames=("cfg", "scfg", "pad_id",
                                             "double_scale", "interpret"),
                   donate_argnums=(2,))  # in-place cache scatter, no pool copy
def _decode_step_jit(params, last_tokens, caches, index, active, rng,
                     cfg: MagnetoConfig, scfg: SamplingConfig,
                     pad_id: int = 1, double_scale: bool = False,
                     shared=None, rows=None, interpret: bool = False):
    return _decode_core(params, last_tokens, caches, index, active, rng,
                        cfg, scfg, pad_id=pad_id, double_scale=double_scale,
                        shared=shared, rows=rows, interpret=interpret)


@functools.partial(jax.jit, static_argnames=("cfg", "scfg", "block",
                                             "pad_id", "double_scale",
                                             "interpret"),
                   donate_argnums=(2,))
def _decode_block_jit(params, last_tokens, caches, index, active, rng,
                      cfg: MagnetoConfig, scfg: SamplingConfig, block: int,
                      pad_id: int = 1, double_scale: bool = False,
                      shared=None, rows=None, interpret: bool = False):
    """``block`` decode steps for every slot in ONE dispatch (lax.scan over
    the single-step core, token feedback on device). Amortizes the per-step
    dispatch/link overhead — on the remote chip one dispatch costs ~3 ms on
    top of a ~7-10 ms flagship decode step. Returns (B, block) tokens and
    their (B, block) log-probs."""
    def body(carry, k):
        last, caches, index = carry
        nxt, lp, caches, index = _decode_core(
            params, last, caches, index, active, jax.random.fold_in(rng, k),
            cfg, scfg, pad_id=pad_id, double_scale=double_scale,
            shared=shared, rows=rows, interpret=interpret)
        return (nxt, caches, index), (nxt, lp)

    (last, caches, index), (toks, lps) = jax.lax.scan(
        body, (last_tokens, caches, index), jnp.arange(block))
    return toks.T, lps.T, last, caches, index


def _spec_core(params, dparams, last_tokens, caches, dcaches,
               index, index_d, active, rng, cfg: MagnetoConfig,
               dcfg: MagnetoConfig, scfg: SamplingConfig,
               gamma: int, pad_id: int = 1, double_scale: bool = False,
               shared_t=None, shared_d=None):
    """One speculative round for every slot (generate.speculative
    .spec_round over the pool). Inactive slots compute on pad feed; their
    index does not advance and their emitted tokens are ignored.
    ``index_d`` is the draft's own cache index (= ``index`` minus the slot's
    image-embed count for multimodal slots — the text-only draft never saw
    the spliced image positions)."""
    from kosmosx_tpu.generate.speculative import spec_round

    last_tokens = jnp.where(active, last_tokens, pad_id)
    emit, emit_lp, n_acc, carry_next, caches, dcaches, _ = spec_round(
        params, dparams, cfg, dcfg, scfg, gamma,
        last_tokens, index, caches, dcaches, rng,
        double_scale_t=double_scale, index_d=index_d,
        shared_t=shared_t, shared_d=shared_d)
    n_emit = jnp.where(active, n_acc + 1, 0)
    index = index + n_emit
    index_d = index_d + n_emit
    return emit, emit_lp, n_emit, carry_next, caches, dcaches, index, index_d


# in-place cache scatters: donate both cache pools
_spec_step_pool_jit = functools.partial(
    jax.jit, static_argnames=("cfg", "dcfg", "scfg", "gamma", "pad_id",
                              "double_scale"),
    donate_argnums=(3, 4))(_spec_core)


@functools.partial(jax.jit, static_argnames=("cfg", "dcfg", "scfg", "gamma",
                                             "block", "pad_id",
                                             "double_scale"),
                   donate_argnums=(3, 4))
def _spec_block_pool_jit(params, dparams, last_tokens, caches, dcaches,
                         index, index_d, active, rng, cfg: MagnetoConfig,
                         dcfg: MagnetoConfig, scfg: SamplingConfig,
                         gamma: int, block: int, pad_id: int = 1,
                         double_scale: bool = False,
                         shared_t=None, shared_d=None):
    """``block`` speculative rounds per dispatch (lax.scan over the round
    core) — the spec analog of ``_decode_block_jit``: the spec engine is
    host-pipeline-bound at small sync_lag, so amortizing the dispatch +
    drain cadence raises throughput. Returns emits (block, B, gamma+1),
    their log-probs, and n_emits (block, B)."""
    def body(carry, k):
        last, caches, dcaches, index, index_d = carry
        emit, emit_lp, n_emit, last, caches, dcaches, index, index_d = \
            _spec_core(
                params, dparams, last, caches, dcaches, index, index_d,
                active, jax.random.fold_in(rng, k), cfg, dcfg, scfg, gamma,
                pad_id=pad_id, double_scale=double_scale,
                shared_t=shared_t, shared_d=shared_d)
        return (last, caches, dcaches, index, index_d), \
            (emit, emit_lp, n_emit)

    (last, caches, dcaches, index, index_d), (emits, emit_lps, n_emits) = \
        jax.lax.scan(body, (last_tokens, caches, dcaches, index, index_d),
                     jnp.arange(block))
    return emits, emit_lps, n_emits, last, caches, dcaches, index, index_d


@functools.partial(jax.jit, static_argnames=("cfg", "scfg", "double_scale"),
                   donate_argnums=(3,))
def _prefill_chunk_pool_jit(params, tokens, seg, caches, index, prefill_mask,
                            boundary, rng, cfg: MagnetoConfig,
                            scfg: SamplingConfig,
                            double_scale: bool = False, shared=None,
                            rows=None):
    """Ingest one prompt chunk for every prefilling slot.

    tokens (B, K) — the next K prompt tokens per prefilling slot (pads
    elsewhere); seg (B, K) — 0 for real tokens, -1 for pads (invalid
    positions' K/V are zeroed before the cache scatter; causal masking +
    boundary selection make them harmless); boundary (B,) — index of the
    last real token within the chunk. Returns (sampled boundary token,
    caches, advanced index). Non-prefilling slots are untouched: zero
    valid tokens, index unchanged (their not-yet-reached cache positions
    get zeroed, which decode overwrites before ever attending to them).
    """
    shared_caches, shared_on, pos_offset = shared or (None, None, None)
    pos = index if pos_offset is None else index + pos_offset
    if double_scale:
        emb = dec.embed_only(params, cfg, tokens)
        x, _ = dec.forward_embedding(params, cfg, token_embedding=emb,
                                     offset=pos[:, None])
    else:
        x, _ = dec.forward_embedding(params, cfg, tokens,
                                     offset=pos[:, None])
    h, caches = dec.run_layers(params, x, cfg, caches=caches,
                               cache_index=index, segment_ids=seg,
                               shared_caches=shared_caches,
                               shared_on=shared_on, pos_offset=pos_offset)
    # only the boundary position's logits are ever used: slice the hidden
    # state first so the vocab projection is (B, 1, D), not (B, K, D)
    hb = jnp.take_along_axis(
        h, jnp.broadcast_to(boundary[:, None, None],
                            (h.shape[0], 1, h.shape[2])), axis=1)
    blog = dec.output_logits(params, hb, cfg)[:, 0].astype(jnp.float32)
    first = sample_logits(blog, rng, scfg, rows=rows)
    n_valid = jnp.sum((seg >= 0).astype(jnp.int32), axis=1)
    index = index + jnp.where(prefill_mask, n_valid, 0)
    return first, token_logprob(blog, first), caches, index


class ServeEngine:
    """Continuous-batching engine over one model replica.

    >>> eng = ServeEngine(params, cfg, ServeConfig(max_batch=4))
    >>> h = eng.submit([3, 17, 9], max_new_tokens=16, eos_id=2)
    >>> eng.run()          # drain all pending/in-flight requests
    >>> h.tokens           # generated ids (stops at eos_id if hit)

    For Kosmos multimodal params pass ``kosmos_cfg`` and submit requests
    with ``images``; text-only requests work against the same engine.
    """

    def __init__(self, params, cfg: MagnetoConfig,
                 serve_cfg: Optional[ServeConfig] = None,
                 sampling: Optional[SamplingConfig] = None,
                 kosmos_cfg: Optional[KosmosConfig] = None,
                 rng: Optional[jax.Array] = None,
                 draft_params=None, draft_cfg: Optional[MagnetoConfig] = None,
                 interpret: bool = False, mesh=None):
        scfg_ = serve_cfg or ServeConfig()
        if cfg.kv_window > 0 or (draft_cfg is not None
                                 and draft_cfg.kv_window > 0):
            # rolling-window serving: single-token decode writes ring;
            # multi-token PREFILL writes are safe (prompts fit the window,
            # enforced below, so they never wrap) — chunked prefill is
            # therefore fine. Speculation is NOT: its multi-token verify
            # runs at arbitrary decode indices that must wrap.
            if scfg_.spec_gamma > 0:
                raise NotImplementedError(
                    "kv_window serving does not compose with speculation "
                    "(the multi-token verify bypasses the ring)")
            if draft_cfg is not None and draft_cfg.kv_window != cfg.kv_window:
                raise ValueError("draft kv_window must match the target's")
            if cfg.kv_sink >= cfg.kv_window:
                raise ValueError(f"kv_sink ({cfg.kv_sink}) must be < "
                                 f"kv_window ({cfg.kv_window})")
            if scfg_.max_prompt_len > cfg.kv_window:
                raise ValueError(
                    f"max_prompt_len ({scfg_.max_prompt_len}) exceeds "
                    f"kv_window ({cfg.kv_window}); prompts must fit the "
                    f"window (prefill is a single un-wrapped write)")
            if scfg_.max_len < cfg.kv_window:
                raise ValueError(
                    f"max_len ({scfg_.max_len}) < kv_window "
                    f"({cfg.kv_window}): ring writes target positions in "
                    f"[0, kv_window) — a smaller buffer silently drops "
                    f"them; set max_len >= kv_window")
        self.cfg = cfg
        self.kcfg = kosmos_cfg
        self.params = params
        self.dec_params = params["decoder"] if kosmos_cfg is not None else params
        self.scfg = serve_cfg or ServeConfig()
        self.sampling = sampling or SamplingConfig(greedy=True)
        self.interpret = interpret
        self.double_scale = bool(kosmos_cfg.parity_double_scale) \
            if kosmos_cfg is not None else False
        self.rng = rng if rng is not None else jax.random.PRNGKey(0)
        b = self.scfg.max_batch
        # Multi-chip serving: pass params sharded over a (tensor-parallel)
        # mesh and the mesh itself; the KV-cache pool then shards its heads
        # dim over the `tensor` axis so decode attention runs fully
        # tensor-parallel (GSPMD propagates the param shardings through
        # every engine jit — greedy outputs are identical to single-device,
        # tests/test_serve.py::test_engine_tensor_parallel_params).
        self.mesh = mesh
        # window-capped cache size: with kv_window the ring bounds memory
        self.cache_len = (min(self.scfg.max_len, cfg.kv_window)
                          if cfg.kv_window > 0 else self.scfg.max_len)
        self.caches = self._shard_cache(
            dec.init_cache(cfg, batch=b, max_len=self.cache_len))
        self.index = jnp.zeros((b,), jnp.int32)
        self.last = jnp.full((b,), self.scfg.pad_id, jnp.int32)
        self.slots: List[Optional[Request]] = [None] * b
        self.pending: deque[Request] = deque()
        self._inflight: deque = deque()  # (nxt tokens on device, slot snapshot)
        self._dispatched = [0] * b       # decode tokens dispatched per slot
        self._active_key = None          # active_list at last mask rebuild
        self._active_dev = None          # device copy of the slot-occupancy
        self._next_id = 0                # mask (rebuilt only when it changes)
        self.steps = 0
        # speculative decoding (ServeConfig.spec_gamma + a draft model)
        self.draft_params = draft_params
        self.draft_cfg = draft_cfg
        self.spec = self.scfg.spec_gamma > 0
        if self.spec:
            if draft_params is None or draft_cfg is None:
                raise ValueError("spec_gamma > 0 needs draft_params and "
                                 "draft_cfg")
            if self.sampling.top_k > 0 or (not self.sampling.greedy
                                           and self.sampling.top_p < 1.0):
                raise NotImplementedError(
                    "speculative serving supports greedy or plain "
                    "temperature sampling")
            self.draft_caches = self._shard_cache(
                dec.init_cache(draft_cfg, batch=b, max_len=self.cache_len))
            # the draft's own cache index: equals the target's for text
            # slots; lags by n_images*image_embed_len for multimodal slots
            # (the text-only draft proposes from tokens alone; the target's
            # verify forward carries the image context)
            self.index_d = jnp.zeros((b,), jnp.int32)
        self.accepted_total = 0   # speculative observability
        self.emitted_total = 0
        # prefix caching (ServeConfig.prefix_cache_size, register_prefix)
        self.prefix_cache: "OrderedDict[tuple, Any]" = OrderedDict()
        self.prefix_hits = 0
        # shared-prefix attention (register_prefix(share=True)): ONE prefix
        # KV segment attended by all flagged slots without per-slot copies
        self.shared_seg = None
        self.pos_offset = jnp.zeros((b,), jnp.int32)
        self.shared_on = jnp.zeros((b,), bool)
        # multi-LoRA serving (load_adapter / submit(adapter=...)): per-slot
        # adapter factor stacks grafted into the decode params — every slot
        # can run a different fine-tune over the one base model
        # per-request sampling overrides (temperature / top-k / top-p):
        # rows flagged in slot_override fully replace the engine's static
        # SamplingConfig; jits take the vectors only once a request asks
        self.slot_override = jnp.zeros((b,), bool)
        self.slot_temp = jnp.ones((b,), jnp.float32)
        self.slot_topk = jnp.zeros((b,), jnp.int32)
        self.slot_topp = jnp.ones((b,), jnp.float32)
        self._override_host = [False] * b  # host mirror of slot_override
        self.adapters: Dict[str, Any] = {}
        self._slot_lora = None       # mirror tree, leaves stacked over slots
        self._slot_axes = None       # slot axis per leaf (1 under scan stack)
        self._zero_adapter = None
        self._insert_adapter_fn = None
        self._live_params = None     # dec_params + slot_lora graft (cached)
        # blocked decode (ServeConfig.decode_block)
        self.block = max(int(self.scfg.decode_block), 0)
        # chunked prefill (ServeConfig.prefill_chunk)
        self.chunked = self.scfg.prefill_chunk > 0
        if self.chunked:
            if self.spec:
                raise NotImplementedError(
                    "chunked prefill + speculative serving is not "
                    "implemented (the draft pool would need chunked "
                    "ingestion too)")
            import numpy as _np
            self._prompt_rows = _np.full(
                (b, self.scfg.max_prompt_len), self.scfg.pad_id, _np.int32)
            self._pf_pos = [-1] * b    # -1 = not prefilling
            self._pf_len = [0] * b

    # -- request API --------------------------------------------------------

    def submit(self, prompt, max_new_tokens: int = 64,
               eos_id: Optional[int] = None, images=None,
               adapter: Optional[str] = None,
               temperature: Optional[float] = None,
               top_k: Optional[int] = None,
               top_p: Optional[float] = None) -> Request:
        import numpy as np

        if adapter is not None and adapter not in self.adapters:
            raise KeyError(f"unknown adapter {adapter!r}; load_adapter first")
        if adapter is not None and images is not None:
            raise NotImplementedError("multi-LoRA serving is text-only")
        if temperature is not None and temperature < 0:
            raise ValueError("temperature must be >= 0")
        if top_k is not None and top_k < 0:
            raise ValueError("top_k must be >= 0")
        if top_p is not None and not (0.0 < top_p <= 1.0):
            raise ValueError("top_p must be in (0, 1]")
        if (temperature is not None or top_k is not None
                or top_p is not None) and self.spec:
            raise NotImplementedError(
                "per-request sampling with speculative serving is not "
                "implemented (the draft/verify acceptance rule is "
                "engine-global); set the engine SamplingConfig instead")

        # ONE host fetch for device-array prompts: per-element int() on a
        # jax array costs one link RTT per token (~3.4 s / 128 tokens on
        # the tunnel, measured)
        prompt = [int(t) for t in
                  np.asarray(jax.device_get(prompt), np.int64).ravel()]
        if not prompt:
            raise ValueError("empty prompt")
        if len(prompt) > self.scfg.max_prompt_len:
            raise ValueError(f"prompt len {len(prompt)} > max_prompt_len "
                             f"{self.scfg.max_prompt_len}")
        extra = 0
        if images is not None:
            if self.kcfg is None:
                raise ValueError("engine was built without kosmos_cfg; "
                                 "multimodal requests need one")
            n_img = images.shape[0] if images.ndim == 4 else 1
            extra = n_img * self.kcfg.image_embed_len
        # headroom: EOS detection lags, speculative rounds write gamma
        # positions past the committed index, and blocked decode writes
        # whole blocks — ServeConfig.overrun_window bounds all of it.
        # Prompts matching the SHARED prefix never store it in their own
        # cache, so only the remainder counts against max_len.
        window = self.scfg.overrun_window
        if self.cfg.kv_window > 0:
            # windowed pool: prompt + IMAGE EMBEDS must fit the un-wrapped
            # prefill; budgets are unbounded by the cache (the ring reuses
            # slots), limited only by the xPos numeric range
            from kosmosx_tpu.nn.xpos import xpos_position_bound

            if len(prompt) + extra > self.cfg.kv_window:
                raise ValueError(
                    f"prompt ({len(prompt)}) + image embeds ({extra}) "
                    f"exceeds kv_window ({self.cfg.kv_window})")
            if self.cfg.xpos_rel_pos:
                bound = xpos_position_bound(self.cfg.xpos_scale_base)
                if len(prompt) + extra + max_new_tokens + window > bound:
                    raise ValueError(
                        f"prompt + image embeds + max_new_tokens = "
                        f"{len(prompt) + extra + max_new_tokens} exceeds "
                        f"the xPos numeric range bound ({bound})")
        else:
            own_prompt = len(prompt)
            # mirror _admit's sh_match condition exactly: adapter requests
            # do NOT use the shared segment (it was prefilled with the base
            # model), so their whole prompt occupies their own cache
            if images is None and adapter is None \
                    and self._matches_shared(prompt):
                own_prompt -= self.shared_seg["len"]
            if (own_prompt + extra + max_new_tokens + window
                    > self.scfg.max_len):
                raise ValueError(
                    f"prompt ({own_prompt} own-cache tokens) + image embeds "
                    f"({extra}) + max_new_tokens ({max_new_tokens}) exceeds "
                    f"cache length {self.scfg.max_len}")
        req = Request(prompt=prompt, max_new_tokens=max_new_tokens,
                      eos_id=eos_id, images=images, adapter=adapter,
                      temperature=temperature, top_k=top_k, top_p=top_p,
                      id=self._next_id)
        self._next_id += 1
        self.pending.append(req)
        return req

    def register_prefix(self, tokens, share: bool = False) -> None:
        """Prefill ``tokens`` once and cache the resulting K/V (LRU, at most
        ``ServeConfig.prefix_cache_size`` entries). Subsequent text prompts
        that start with these tokens are admitted by copying the cached
        K/V into their slot and prefilling only the remainder — cutting the
        admission prefill from O(prompt) to O(prompt - prefix).

        ``share=True`` goes further (RelayAttention-style): the prefix K/V
        becomes ONE broadcast segment attended by every matching slot — no
        per-slot copy at all, so a P-token system prompt costs P cache
        positions TOTAL instead of P per slot, and each slot's own cache
        only needs (prompt - P) + new positions. One shared segment per
        engine; registering replaces it (engine must be idle). Greedy
        outputs are identical to full prefill either way (the softmax runs
        over the exact concatenated [shared | own] scores).

        TPU-native contrast with block-level automatic prefix caching
        (vLLM): the pool keeps contiguous per-slot caches with static
        shapes, so sharing is at explicit registered-prefix granularity —
        zero per-token bookkeeping, no gathers."""
        import numpy as np

        if not share and self.scfg.prefix_cache_size <= 0:
            # the shared segment lives in self.shared_seg, not the LRU —
            # size 0 only disables copy-mode caching
            raise ValueError("ServeConfig.prefix_cache_size is 0")
        toks = [int(t) for t in
                np.asarray(jax.device_get(tokens), np.int64).ravel()]
        if not toks:
            raise ValueError("empty prefix")
        if len(toks) >= self.scfg.max_prompt_len:
            raise ValueError(
                f"prefix len {len(toks)} must be < max_prompt_len "
                f"{self.scfg.max_prompt_len} (a matching prompt needs at "
                f"least one suffix token)")
        if share:
            if self.num_active or self._inflight or self.pending:
                raise ValueError("register_prefix(share=True) requires an "
                                 "idle engine (it re-bases slot positions)")
            if self.cfg.kv_window == 0 and \
                    len(toks) + self.scfg.max_len \
                    > self.cfg.max_target_positions:
                # matching slots embed at offset index + P; traced offsets
                # bypass the positional table's loud host-side bound check,
                # so enforce it here instead of silently clamping
                raise ValueError(
                    f"shared prefix ({len(toks)}) + max_len "
                    f"({self.scfg.max_len}) exceeds the learned position "
                    f"table ({self.cfg.max_target_positions}); raise "
                    f"max_positions or shrink max_len")
        key = tuple(toks)
        if not share and key in self.prefix_cache:
            self.prefix_cache.move_to_end(key)
            return
        p = self.scfg.max_prompt_len
        prompt = jnp.asarray(
            np.pad(np.asarray(toks, np.int32), (0, p - len(toks)),
                   constant_values=self.scfg.pad_id))[None, :]
        length = jnp.asarray([len(toks)], jnp.int32)
        # deterministic rng: the sampled token is discarded
        _, _, c1 = _prefill_one_jit(
            self.dec_params, prompt, length, jax.random.PRNGKey(0), self.cfg,
            self.sampling, self.cache_len, double_scale=self.double_scale,
            interpret=self.interpret)
        if share:
            self.shared_seg = {"key": key, "len": len(toks),
                               "caches": _trim_shared(c1, len(toks),
                                                      self.cfg.dtype)}
            if self.spec:
                # the draft pool attends its OWN shared segment (text-only
                # prefix prefilled through the draft)
                _, _, cd1 = _prefill_one_jit(
                    self.draft_params, prompt, length, jax.random.PRNGKey(0),
                    self.draft_cfg, self.sampling, self.cache_len,
                    interpret=self.interpret)
                self.shared_seg["draft_caches"] = _trim_shared(
                    cd1, len(toks), self.draft_cfg.dtype)
            return
        entry = {"caches": c1, "len": len(toks), "draft": None}
        if self.spec:
            _, _, cd1 = _prefill_one_jit(
                self.draft_params, prompt, length, jax.random.PRNGKey(0),
                self.draft_cfg, self.sampling, self.cache_len,
                interpret=self.interpret)
            entry["draft"] = cd1
        self.prefix_cache[key] = entry
        while len(self.prefix_cache) > self.scfg.prefix_cache_size:
            self.prefix_cache.popitem(last=False)

    def load_adapter(self, name: str, lora_tree) -> None:
        """Register a LoRA adapter for multi-tenant serving: requests submit
        with ``adapter=name`` and every slot decodes through its own
        factors, grafted per-row into the shared base (S-LoRA-style, but
        static-shape: the per-slot factor stacks live at the adapted
        linears' pytree paths and nn/layers.linear applies them as two thin
        batched einsums — no gathers, no recompilation per adapter).

        ``lora_tree``: the mirror tree from train/lora.strip_lora (or a
        LoraTrainer state's ``lora`` subtree)."""
        from kosmosx_tpu.train.lora import attach_lora, num_lora_params

        if self.kcfg is not None:
            raise NotImplementedError(
                "multi-LoRA serving is text-only for now (adapters attach "
                "to the decoder; build the engine without kosmos_cfg)")
        if self.spec:
            raise NotImplementedError(
                "multi-LoRA + speculative serving is not implemented (the "
                "draft would need per-slot adapters too)")
        if num_lora_params(lora_tree) == 0:
            raise ValueError("lora_tree has no adapter factors")
        flat = jax.tree_util.tree_map(jnp.asarray, lora_tree)
        if self._slot_lora is None:
            self._init_slot_lora(flat)
        # per-adapter batch-1 prefill params (graft shares the base arrays)
        self.adapters[name] = {
            "tree": flat,
            "params": attach_lora(self.dec_params, flat),
        }

    def _init_slot_lora(self, template):
        b = self.scfg.max_batch

        def axis(path, leaf):
            names = [getattr(p, "key", None) for p in path]
            # scan-stacked decoder layers carry a leading L axis; the slot
            # axis slots in right after it so lax.scan still slices L first
            return 1 if "layers" in names and leaf.ndim >= 1 and \
                not any(hasattr(p, "idx") for p in path) else 0

        self._slot_axes = jax.tree_util.tree_map_with_path(axis, template)
        self._slot_lora = jax.tree_util.tree_map(
            lambda x, ax: jnp.zeros(x.shape[:ax] + (b,) + x.shape[ax:],
                                    x.dtype),
            template, self._slot_axes)
        self._zero_adapter = jax.tree_util.tree_map(jnp.zeros_like, template)
        axes = self._slot_axes

        def ins(dst, src, slot):
            return jax.tree_util.tree_map(
                lambda d, s, ax: jax.lax.dynamic_update_index_in_dim(
                    d, s, slot, ax), dst, src, axes)

        self._insert_adapter_fn = jax.jit(ins, donate_argnums=(0,))

    def _set_slot_adapter(self, slot: int, name: Optional[str]):
        if self._slot_lora is None:
            return
        src = (self.adapters[name]["tree"] if name is not None
               else self._zero_adapter)
        self._slot_lora = self._insert_adapter_fn(self._slot_lora, src, slot)
        from kosmosx_tpu.train.lora import attach_lora
        self._live_params = attach_lora(self.dec_params, self._slot_lora)

    def _pool_params(self):
        """Decode-path params: the base, or base + per-slot adapter stacks
        once any adapter has been loaded."""
        return self._live_params if self._live_params is not None \
            else self.dec_params

    @staticmethod
    def _row1(req: Request):
        """Batch-1 rows tuple for admission prefills, or None."""
        if req.temperature is None and req.top_k is None \
                and req.top_p is None:
            return None
        return (jnp.ones((1,), bool),
                jnp.asarray([1.0 if req.temperature is None
                             else float(req.temperature)], jnp.float32),
                jnp.asarray([0 if req.top_k is None else int(req.top_k)],
                            jnp.int32),
                jnp.asarray([1.0 if req.top_p is None
                             else float(req.top_p)], jnp.float32))

    def _rows(self):
        """Per-slot sampling-override vectors (on, temp, top_k, top_p), or
        None while no OCCUPIED slot carries an override — all-default
        traffic keeps the cheap sampler program (the rows variant pays two
        (B, V) sorts per step)."""
        if not any(self._override_host[i]
                   for i, s in enumerate(self.slots) if s is not None):
            return None
        return (self.slot_override, self.slot_temp, self.slot_topk,
                self.slot_topp)

    def _shared(self):
        """(shared_caches, shared_on, pos_offset) for the jitted cores."""
        if self.shared_seg is None:
            return None
        return (self.shared_seg["caches"], self.shared_on, self.pos_offset)

    def _shared_d(self):
        """The DRAFT pool's shared segment (speculative engines)."""
        if self.shared_seg is None or "draft_caches" not in self.shared_seg:
            return None
        return (self.shared_seg["draft_caches"], self.shared_on,
                self.pos_offset)

    def _matches_shared(self, toks) -> bool:
        sh = self.shared_seg
        return (sh is not None and len(toks) > sh["len"]
                and [int(t) for t in toks[:sh["len"]]] == list(sh["key"]))

    def _match_prefix(self, praw):
        """Longest registered prefix that strictly prefixes ``praw``."""
        best = None
        for key in self.prefix_cache:
            n = len(key)
            if n < len(praw) and (best is None or n > best[1]) \
                    and list(praw[:n]) == list(key):
                best = (key, n)
        if best is None:
            return None
        self.prefix_cache.move_to_end(best[0])
        self.prefix_hits += 1
        return self.prefix_cache[best[0]]

    def warmup(self, images=None, adapters: bool = True) -> int:
        """Compile every program this engine will dispatch before real
        traffic: one throwaway request per admission flavor (each prompt
        bucket, each loaded adapter when ``adapters``, a multimodal request
        when ``images`` is given, prefix hits when prefixes are registered)
        plus the decode/chunk/spec step programs, then drain. On a remote
        chip the first compile of each program costs seconds to minutes —
        pay it at deploy time, not on the first user request. Returns the
        number of warmup requests run. Requires an idle engine."""
        if self.num_active or self._inflight or self.pending:
            raise ValueError("warmup requires an idle engine")
        import numpy as np

        tok = self.scfg.pad_id + 1
        p = self.scfg.max_prompt_len
        flavors = []
        buckets = [b for b in sorted(self.scfg.prompt_buckets) if b <= p]
        for b in buckets:
            flavors.append({"prompt": [tok] * b})
        # the full-length (pad-to-max_prompt_len) program: use the SHORTEST
        # prompt that misses every bucket, so tight max_len budgets can
        # still admit it
        full_len = min(p, (max(buckets) + 1) if buckets else 2)
        flavors.append({"prompt": [tok] * full_len})
        if adapters:
            for name in self.adapters:
                flavors.append({"prompt": [self.scfg.pad_id + 1] * 2,
                                "adapter": name})
        if images is not None:
            flavors.append({"prompt": [self.scfg.pad_id + 1] * 2,
                            "images": np.asarray(images)})
        for key in list(self.prefix_cache)[:1]:
            flavors.append({"prompt": list(key) + [self.scfg.pad_id + 1]})
        if self.shared_seg is not None:
            flavors.append({"prompt": list(self.shared_seg["key"])
                            + [self.scfg.pad_id + 1]})
        hits_before = self.prefix_hits
        handles = []
        for f in flavors:
            try:
                handles.append(self.submit(max_new_tokens=2, **f))
            except ValueError:
                # a flavor that cannot fit max_len can never be dispatched
                # by real traffic either (e.g. full-length prompts on a
                # tight cache) — nothing to warm
                pass
        self.run()
        assert all(h.done for h in handles)
        self.prefix_hits = hits_before  # warmup must not skew stats
        self.emitted_total = 0
        self.accepted_total = 0
        self.steps = 0
        return len(handles)

    def cancel(self, req: Request) -> bool:
        """Abort a request: drop it from the pending queue or free its slot.
        Tokens already committed stay on ``req.tokens``; tokens still in
        flight are discarded by the drain (same machinery as EOS). Returns
        False if the request had already finished."""
        if req.done:
            return False
        req.done = True
        try:
            self.pending.remove(req)
        except ValueError:
            pass
        for i, s in enumerate(self.slots):
            if s is req:
                self.slots[i] = None
                if self.chunked:
                    self._pf_pos[i] = -1
        return True

    # -- internals -----------------------------------------------------------

    def _fold(self):
        self.rng, sub = jax.random.split(self.rng)
        return sub

    def _shard_cache(self, caches):
        """Shard the pooled KV cache's heads dim over the mesh's `tensor`
        axis (cache leaves are (B, H, S, D) or stacked (L, B, H, S, D|1);
        heads = ndim-3). Leaves whose head count doesn't divide the axis
        stay replicated. No-op without a mesh."""
        if self.mesh is None:
            return caches
        from jax.sharding import NamedSharding, PartitionSpec as P
        tp = int(self.mesh.shape.get("tensor", 1))

        def put(x):
            nd = getattr(x, "ndim", 0)
            h = nd - 3
            spec = [None] * nd
            if tp > 1 and nd >= 4 and x.shape[h] % tp == 0:
                spec[h] = "tensor"
            return jax.device_put(x, NamedSharding(self.mesh, P(*spec)))

        return jax.tree_util.tree_map(put, caches)

    def _admit(self, slot: int, req: Request):
        import numpy as np

        self._dispatched[slot] = 0
        p = self.scfg.max_prompt_len
        praw = np.asarray(req.prompt, np.int32)  # submit() normalized it
        s_idx = self.kcfg.splice_index if self.kcfg is not None else 0
        # per-slot LoRA adapter (cleared to zeros when the request has none)
        self._set_slot_adapter(slot, req.adapter)
        # per-request sampling overrides (flagged rows fully replace the
        # engine's static SamplingConfig; temperature defaults to 1.0 when
        # only top-k/top-p are given)
        override = (req.temperature is not None or req.top_k is not None
                    or req.top_p is not None)
        self._override_host[slot] = override
        self.slot_override = self.slot_override.at[slot].set(override)
        self.slot_temp = self.slot_temp.at[slot].set(
            1.0 if req.temperature is None else float(req.temperature))
        self.slot_topk = self.slot_topk.at[slot].set(
            0 if req.top_k is None else int(req.top_k))
        self.slot_topp = self.slot_topp.at[slot].set(
            1.0 if req.top_p is None else float(req.top_p))
        # shared-prefix segment: matching slots attend it in place (no
        # copy); their own cache starts at 0 with positions shifted by P.
        # Adapter requests skip BOTH prefix paths: registered prefixes were
        # prefilled with the BASE model, and an adapted model processes the
        # prefix differently.
        sh_match = (req.images is None and req.adapter is None
                    and self._matches_shared(praw))
        if self.shared_seg is not None:
            self.shared_on = self.shared_on.at[slot].set(bool(sh_match))
            self.pos_offset = self.pos_offset.at[slot].set(
                self.shared_seg["len"] if sh_match else 0)
            if sh_match:
                self.prefix_hits += 1
                praw = praw[self.shared_seg["len"]:]  # own-cache remainder
        # prefix cache: text-only prompts matching a registered prefix skip
        # its prefill (the cached K/V is copied into the slot)
        hit = (self._match_prefix(praw)
               if self.prefix_cache and req.images is None and not sh_match
               and req.adapter is None else None)
        if self.chunked and (req.images is None or len(praw) > s_idx):
            # no full-prompt device work now: the text streams in
            # chunk-by-chunk via _advance_prefill, interleaved with other
            # slots' decode steps
            self._prompt_rows[slot, :] = self.scfg.pad_id
            self._prompt_rows[slot, :len(praw)] = praw
            self._pf_len[slot] = len(praw)
            if req.images is not None:
                # one-shot vision tower + spliced-prefix prefill (cheap:
                # splice_index tokens + M*64 image embeds); the text
                # remainder joins the pooled chunk stream at s_idx
                images = (req.images if req.images.ndim == 5
                          else req.images[None])
                c1, idx0 = _prefill_mm_prefix_jit(
                    self.params, jnp.asarray(praw[:s_idx])[None, :], images,
                    self.kcfg, self.cache_len)
                self.caches = _insert_slot_jit(self.caches, c1, slot)
                self._pf_pos[slot] = s_idx
                self.index = self.index.at[slot].set(idx0[0])
            elif hit is not None:
                # prefix hit: the chunk stream starts after the cached part
                self.caches = _insert_slot_jit(self.caches, hit["caches"],
                                               slot)
                self._pf_pos[slot] = hit["len"]
                self.index = self.index.at[slot].set(hit["len"])
            else:
                self._pf_pos[slot] = 0
                self.index = self.index.at[slot].set(0)
            self.slots[slot] = req
            return
        if hit is not None or sh_match:
            # plain-path prefix hit: copy the cached K/V into the slot (copy
            # mode) or rely on the broadcast shared segment (share mode),
            # then prefill only the suffix through the pooled chunk program
            # (one compile at K = max_prompt_len; in-flight slots are
            # unaffected — their rows carry zero valid tokens and their
            # index is fixed)
            if hit is not None:
                suffix = praw[hit["len"]:]
                self.caches = _insert_slot_jit(self.caches, hit["caches"],
                                               slot)
                self.index = self.index.at[slot].set(hit["len"])
                if self.spec:
                    self.draft_caches = _insert_slot_jit(
                        self.draft_caches, hit["draft"], slot)
                    self.index_d = self.index_d.at[slot].set(hit["len"])
            else:
                suffix = praw  # already trimmed to the own-cache remainder
                self.index = self.index.at[slot].set(0)
                if self.spec:
                    self.index_d = self.index_d.at[slot].set(0)
            tok, tlp = self._suffix_prefill(slot, suffix)
            self._commit_first_token(slot, req, tok, tlp)
            return
        # bucketed admission (ServeConfig.prompt_buckets): pad to the
        # smallest bucket that fits — prefill FLOPs scale with the bucket,
        # so short prompts admit proportionally faster
        pad_to = p
        for bucket in sorted(self.scfg.prompt_buckets):
            if len(praw) <= bucket <= p:
                pad_to = bucket
                break
        prompt = jnp.asarray(
            np.pad(praw, (0, pad_to - len(praw)),
                   constant_values=self.scfg.pad_id))[None, :]
        length = jnp.asarray([len(praw)], jnp.int32)
        if req.images is not None:
            images = req.images if req.images.ndim == 5 else req.images[None]
            r1 = self._row1(req)
            first, flp, c1, full_len = _prefill_mm_one_jit(
                self.params, prompt, images, length, self._fold(),
                self.kcfg, self.sampling, self.cache_len, rows=r1)
            idx = full_len
        else:
            pparams = (self.adapters[req.adapter]["params"]
                       if req.adapter is not None else self.dec_params)
            r1 = self._row1(req)
            first, flp, c1 = _prefill_one_jit(
                pparams, prompt, length, self._fold(), self.cfg,
                self.sampling, self.cache_len,
                double_scale=self.double_scale, interpret=self.interpret,
                rows=r1)
            idx = length
        self.caches = _insert_slot_jit(self.caches, c1, slot)
        if self.spec:
            # the draft prefills on the TOKENS only (for multimodal slots
            # that's the raw prompt incl. the <image></image> tag ids; it
            # never sees image embeddings — the target's verify carries the
            # image context). The draft never double-scales.
            _, _, cd1 = _prefill_one_jit(
                self.draft_params, prompt, length, self._fold(),
                self.draft_cfg, self.sampling, self.cache_len,
                interpret=self.interpret)
            self.draft_caches = _insert_slot_jit(self.draft_caches, cd1,
                                                 slot)
            self.index_d = self.index_d.at[slot].set(len(praw))
        self.index = self.index.at[slot].set(idx[0])
        tok_h, lp_h = jax.device_get((first, flp))  # ONE host round-trip
        self._commit_first_token(slot, req, int(tok_h[0]), float(lp_h[0]))

    def _suffix_prefill(self, slot: int, suffix):
        """Prefill ``suffix`` tokens for ONE slot through the pooled chunk
        program (target + draft pools), starting at the slot's current
        index; returns (sampled boundary token, its log-prob). Other slots'
        rows carry zero valid tokens and their index is untouched."""
        import numpy as np

        b, p = self.scfg.max_batch, self.scfg.max_prompt_len
        chunk = np.full((b, p), self.scfg.pad_id, np.int32)
        chunk[slot, :len(suffix)] = suffix
        seg = np.full((b, p), -1, np.int32)
        seg[slot, :len(suffix)] = 0
        boundary = np.zeros((b,), np.int32)
        boundary[slot] = len(suffix) - 1
        mask = np.zeros((b,), bool)
        mask[slot] = True
        first, flp, self.caches, self.index = _prefill_chunk_pool_jit(
            self.dec_params, jnp.asarray(chunk), jnp.asarray(seg),
            self.caches, self.index, jnp.asarray(mask),
            jnp.asarray(boundary), self._fold(), self.cfg, self.sampling,
            double_scale=self.double_scale, shared=self._shared(),
            rows=self._rows())
        if self.spec:
            _, _, self.draft_caches, self.index_d = _prefill_chunk_pool_jit(
                self.draft_params, jnp.asarray(chunk), jnp.asarray(seg),
                self.draft_caches, self.index_d, jnp.asarray(mask),
                jnp.asarray(boundary), jax.random.PRNGKey(0),
                self.draft_cfg, self.sampling, shared=self._shared_d())
        tok_h, lp_h = jax.device_get((first, flp))  # ONE host round-trip
        return int(tok_h[slot]), float(lp_h[slot])

    def _commit_first_token(self, slot: int, req: Request, tok: int,
                            lp: float):
        """Bookkeeping shared by every admission flavor: the prefill's
        sampled token enters the slot's device feed and the request's
        output, and counts toward its budget."""
        self.last = self.last.at[slot].set(tok)
        self.slots[slot] = req
        req.tokens.append(tok)
        req.logprobs.append(lp)
        self._dispatched[slot] = 1
        self.emitted_total += 1
        self._maybe_finish(slot, tok)

    def _maybe_finish(self, slot: int, tok: int):
        req = self.slots[slot]
        if req is not None:
            self._finish_if_needed(slot, req, tok)

    def _finish_if_needed(self, slot: int, req: Request, tok: int):
        if ((req.eos_id is not None and tok == req.eos_id)
                or len(req.tokens) >= req.max_new_tokens):
            req.done = True
            # no need to pad ``last[slot]``: _decode_step_jit masks inactive
            # slots to pad on device. Guard against the slot having been
            # re-admitted (possible when bookkeeping lags dispatch).
            if self.slots[slot] is req:
                self.slots[slot] = None

    @property
    def num_active(self) -> int:
        return sum(s is not None for s in self.slots)

    def _is_prefilling(self, slot: int) -> bool:
        return self.chunked and self._pf_pos[slot] >= 0

    @property
    def num_decoding(self) -> int:
        return sum(s is not None and not self._is_prefilling(i)
                   for i, s in enumerate(self.slots))

    def _advance_prefill(self):
        """Ingest one chunk for every prefilling slot; slots whose prompt
        completes sample their first token and switch to decoding."""
        import numpy as np

        K = self.scfg.prefill_chunk
        b = self.scfg.max_batch
        chunk = np.full((b, K), self.scfg.pad_id, np.int32)
        seg = np.full((b, K), -1, np.int32)
        boundary = np.zeros((b,), np.int32)
        mask = np.zeros((b,), bool)
        completing = []
        for slot in range(b):
            pos = self._pf_pos[slot]
            if pos < 0:
                continue
            plen = self._pf_len[slot]
            n = min(K, plen - pos)
            chunk[slot, :n] = self._prompt_rows[slot, pos:pos + n]
            seg[slot, :n] = 0
            boundary[slot] = n - 1
            mask[slot] = True
            if pos + n >= plen:
                completing.append(slot)
        first, flp, self.caches, self.index = _prefill_chunk_pool_jit(
            self._pool_params(), jnp.asarray(chunk), jnp.asarray(seg),
            self.caches, self.index, jnp.asarray(mask),
            jnp.asarray(boundary), self._fold(), self.cfg, self.sampling,
            double_scale=self.double_scale, shared=self._shared(),
            rows=self._rows())
        if completing:
            toks, lps = jax.device_get((first, flp))  # ONE round-trip
            for slot in completing:
                req = self.slots[slot]
                tok = int(toks[slot])
                self.last = self.last.at[slot].set(tok)
                self._pf_pos[slot] = -1
                if req is not None:
                    req.tokens.append(tok)
                    req.logprobs.append(float(lps[slot]))
                    self._dispatched[slot] = 1  # prefill token counts
                    self.emitted_total += 1
                    self._finish_if_needed(slot, req, tok)
        for slot in range(b):
            if self._pf_pos[slot] >= 0 and slot not in completing:
                self._pf_pos[slot] += K

    def step(self) -> bool:
        """Admit pending requests into free slots, advance every active slot
        one token, and read back tokens (``sync_lag`` steps behind the
        device). Returns False when there is nothing left to do."""
        for slot in range(self.scfg.max_batch):
            if self.slots[slot] is None and self.pending:
                self._admit(slot, self.pending.popleft())
        if self.chunked and any(p >= 0 for p in self._pf_pos):
            self._advance_prefill()
        # budget clamp: the host KNOWS each request's max_new_tokens at
        # submit time, so a slot whose dispatched-token count has reached
        # its budget is excluded from `active` immediately — without this,
        # sync_lag/decode_block overrun decodes up to (sync_lag+1)*block
        # discarded tokens per request before the drain detects the budget
        # (measured 31% throughput loss at lag 4 x block 4 with 64-token
        # budgets). Only EOS — which the host can't predict — still pays
        # the detection lag. (Speculation commits a variable 1..gamma+1
        # tokens per round, so its dispatch count isn't host-predictable
        # and it keeps the drain-time check.)
        active_list = [
            s is not None and not self._is_prefilling(i)
            and (self.spec or self._dispatched[i] < s.max_new_tokens)
            for i, s in enumerate(self.slots)]
        if any(active_list):
            key = tuple(active_list)
            if self._active_dev is None or key != self._active_key:
                self._active_dev = jnp.asarray(active_list, bool)
                self._active_key = key
            active = self._active_dev
            if self.spec and self.block > 1:
                emit, emit_lp, n_emit, self.last, self.caches, \
                    self.draft_caches, \
                    self.index, self.index_d = _spec_block_pool_jit(
                        self.dec_params, self.draft_params, self.last,
                        self.caches, self.draft_caches, self.index,
                        self.index_d, active,
                        self._fold(), self.cfg, self.draft_cfg,
                        self.sampling, self.scfg.spec_gamma, self.block,
                        pad_id=self.scfg.pad_id,
                        double_scale=self.double_scale,
                        shared_t=self._shared(), shared_d=self._shared_d())
            elif self.spec:
                emit, emit_lp, n_emit, carry, self.caches, \
                    self.draft_caches, \
                    self.index, self.index_d = _spec_step_pool_jit(
                        self.dec_params, self.draft_params, self.last,
                        self.caches, self.draft_caches, self.index,
                        self.index_d, active,
                        self._fold(), self.cfg, self.draft_cfg,
                        self.sampling, self.scfg.spec_gamma,
                        pad_id=self.scfg.pad_id,
                        double_scale=self.double_scale,
                        shared_t=self._shared(), shared_d=self._shared_d())
                self.last = carry
            elif self.block > 1:
                emit, emit_lp, self.last, self.caches, self.index = \
                    _decode_block_jit(
                    self._pool_params(), self.last, self.caches, self.index,
                    active, self._fold(), self.cfg, self.sampling,
                    self.block, pad_id=self.scfg.pad_id,
                    double_scale=self.double_scale,
                    shared=self._shared(), rows=self._rows(),
                    interpret=self.interpret)
                n_emit = [self.block if a else 0 for a in active_list]
            else:
                nxt, nlp, self.caches, self.index = _decode_step_jit(
                    self._pool_params(), self.last, self.caches, self.index,
                    active, self._fold(), self.cfg, self.sampling,
                    pad_id=self.scfg.pad_id,
                    double_scale=self.double_scale,
                    shared=self._shared(), rows=self._rows(),
                    interpret=self.interpret)
                # the decode feedback loop stays on DEVICE (last <- nxt):
                # rebuilding ``last`` host-side would cost a host→device
                # RTT per token on remote links (~25 ms on the axon
                # tunnel); inactive slots are masked to pad inside the jit.
                self.last = nxt
                # one token per slot that was ACTIVE in this dispatch
                # (occupied-but-prefilling slots must not be credited)
                emit = nxt[:, None]
                emit_lp = nlp[:, None]
                n_emit = [1 if a else 0 for a in active_list]
            self.steps += 1
            if not self.spec:
                for i, n in enumerate(n_emit):
                    self._dispatched[i] += n
            try:  # start the device->host copy now; read it sync_lag later
                emit.copy_to_host_async()
                emit_lp.copy_to_host_async()
                if hasattr(n_emit, "copy_to_host_async"):
                    n_emit.copy_to_host_async()
            except AttributeError:  # backend without async copies
                pass
            self._inflight.append((emit, emit_lp, n_emit, list(self.slots)))
        # with DISPATCHING slots, keep up to sync_lag reads outstanding;
        # once nothing dispatched this step (pool idle, or every occupied
        # slot budget-clamped awaiting its drain), drain everything
        while len(self._inflight) > (self.scfg.sync_lag
                                     if any(active_list) else 0):
            self._drain_one()
        return (self.num_active > 0 or bool(self.pending)
                or bool(self._inflight))

    def _drain_one(self):
        """Read back the oldest outstanding step's tokens and bookkeep
        against the slot occupancy AT DISPATCH TIME (a finished request's
        trailing speculative tokens are discarded)."""
        emit, emit_lp, n_emit, snapshot = self._inflight.popleft()
        # one batched transfer: tokens + logprobs (+ spec counts)
        toks, lps = jax.device_get((emit, emit_lp))
        counts = (n_emit if isinstance(n_emit, list)
                  else jax.device_get(n_emit))
        if getattr(toks, "ndim", 2) == 3:     # blocked spec: (K, B, g+1)
            rounds = [(toks[k], lps[k], [int(n) for n in counts[k]])
                      for k in range(toks.shape[0])]
        else:
            rounds = [(toks, lps, [int(n) for n in counts])]
        for rtoks, rlps, rcounts in rounds:
            for slot, req in enumerate(snapshot):
                if req is None or req.done:
                    continue
                committed = 0
                for j in range(rcounts[slot]):
                    if req.done or len(req.tokens) >= req.max_new_tokens:
                        break  # sync-lag overrun past budget/EOS
                    tok = int(rtoks[slot, j])
                    req.tokens.append(tok)
                    req.logprobs.append(float(rlps[slot, j]))
                    self.emitted_total += 1
                    committed += 1
                    self._finish_if_needed(slot, req, tok)
                if self.spec and committed > 0:
                    # draft tokens actually banked this round (the +1 is
                    # the target's own correction/bonus token)
                    self.accepted_total += committed - 1

    def run(self, max_steps: Optional[int] = None):
        """Drain every pending/in-flight request (bounded by max_steps)."""
        n = 0
        while (self.pending or self.num_active or self._inflight) and (
                max_steps is None or n < max_steps):
            self.step()
            n += 1
        return n
