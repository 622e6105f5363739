"""Jitted device programs for the serving engine.

Every program here has STATIC shapes (slots padded to max_batch, prompts to
max_prompt_len) so the engine compiles a fixed, small set of programs no
matter how requests arrive — the TPU-native answer to the reference's absent
serving layer (SURVEY.md §1: no generation loop, no KV cache use anywhere).
Cache pools are donated into every step (in-place scatter, no pool copy).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from kosmosx_tpu.core.config import KosmosConfig, MagnetoConfig
from kosmosx_tpu.generate.sampler import (SamplingConfig, _prefill,
                                           sample_logits, token_logprob)
from kosmosx_tpu.nn import decoder as dec
from kosmosx_tpu.nn import layers


@functools.partial(jax.jit, static_argnames=("cfg", "scfg", "max_len",
                                             "double_scale", "interpret"))
def _prefill_one_jit(params, prompt, length, rng, cfg: MagnetoConfig,
                     scfg: SamplingConfig, max_len: int,
                     double_scale: bool = False, interpret: bool = False,
                     rows=None):
    """prompt (A, P) -> (first_tokens (A,), logprobs (A,), batch-A caches).

    Batch-generic: admission calls it at A=1 (one request) and at the
    batched-admission bucket sizes (engine.step collects simple text-only
    admissions and prefills them in ONE dispatch — prefill is weight-read
    bound, so A prompts cost barely more than one; each distinct A
    compiles its own program, which is why the engine buckets A to powers
    of two). ``double_scale`` must match the engine's decode convention
    (the Kosmos parity quirk) or the prompt and the decoded tokens are
    embedded at different scales."""
    caches = dec.init_cache(cfg, batch=prompt.shape[0], max_len=max_len)
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


@functools.partial(jax.jit, static_argnames=("cfg", "scfg", "max_len",
                                             "double_scale", "interpret"))
def _prefill_suffix_one_jit(params, suffix, length, start, caches_one, rng,
                            cfg: MagnetoConfig, scfg: SamplingConfig,
                            max_len: int = 0, double_scale: bool = False,
                            shared=None, rows=None, interpret: bool = False):
    """Continue a batch-1 prefill: ingest ``suffix`` (1, K; pads past
    ``length``) into ``caches_one`` at cache position ``start``.

    This is the prefix-hit admission program. Routing the suffix through
    the pooled chunk program costs max_batch x max_prompt_len token FLOPs
    plus a donated round-trip of the WHOLE pool — measured 123.5 ms
    admission (copy mode) / 87.6 ms (share mode) vs 62.2 ms for a plain
    batch-1 full prefill on the flagship, turning prefix caching into a
    regression. Batch-1 suffix FLOPs restore the saving.

    ``caches_one`` is NOT donated: in copy mode it is the LRU entry, which
    must stay pristine for the next hit. Pass ``caches_one=None`` with
    ``max_len`` to start from a fresh batch-1 cache (shared-prefix mode:
    the slot cache holds only the remainder; the prefix K/V lives in the
    broadcast ``shared`` segment and positions shift by its length).

    Returns (first_token (1,), its log-prob (1,), batch-1 caches ready for
    ``_insert_slot_jit``).
    """
    if caches_one is None:
        caches_one = dec.init_cache(cfg, batch=1, max_len=max_len)
    shared_caches, shared_on, pos_offset = shared or (None, None, None)
    k = suffix.shape[1]
    seg = jnp.where(jnp.arange(k)[None, :] < length[:, None], 0, -1
                    ).astype(jnp.int32)
    pos = start if pos_offset is None else start + pos_offset
    if double_scale:
        emb = dec.embed_only(params, cfg, suffix)
        x, _ = dec.forward_embedding(params, cfg, token_embedding=emb,
                                     offset=pos[:, None])
    else:
        x, _ = dec.forward_embedding(params, cfg, suffix,
                                     offset=pos[:, None])
    h, caches_one = dec.run_layers(params, x, cfg, caches=caches_one,
                                   cache_index=start, segment_ids=seg,
                                   shared_caches=shared_caches,
                                   shared_on=shared_on,
                                   pos_offset=pos_offset,
                                   interpret=interpret)
    hb = jnp.take_along_axis(
        h, jnp.broadcast_to((length - 1)[:, None, None],
                            (h.shape[0], 1, h.shape[2])), axis=1)
    blog = dec.output_logits(params, hb, cfg)[:, 0].astype(jnp.float32)
    first = sample_logits(blog, rng, scfg, rows=rows)
    return first, token_logprob(blog, first), caches_one


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
    is donated (in-place update instead of a full pooled-cache copy). The
    pool may be a per-layer LIST (unrolled-decode engines) while the batch-1
    prefill/prefix caches stay stacked ``(L, 1, H, S, ·)`` — the stacked
    side is unstacked here (the per-layer slices fuse into the slot writes;
    nothing extra materializes)."""
    if isinstance(caches, (list, tuple)) and \
            not isinstance(caches_one, (list, tuple)):
        caches_one = [jax.tree_util.tree_map(lambda c: c[li], caches_one)
                      for li in range(len(caches))]

    def ins(pool, one):
        axis = 1 if pool.ndim == 5 else 0  # stacked (L,B,H,S,hd) vs (B,H,S,hd)
        return jax.lax.dynamic_update_index_in_dim(
            pool, jnp.take(one, 0, axis=axis), slot, axis)

    return jax.tree_util.tree_map(ins, caches, caches_one)


@functools.partial(jax.jit, donate_argnums=(0,))
def _insert_rows_jit(caches, caches_many, slots):
    """Scatter a batch-A cache's rows into pool slots ``slots`` (A,) int32.

    The batched-admission analog of ``_insert_slot_jit``: one donated
    scatter per leaf instead of A sequential batch-1 inserts. ``slots`` is
    traced (one compiled program per A, any slot assignment). Handles the
    per-layer LIST pool layout the same way _insert_slot_jit does."""
    if isinstance(caches, (list, tuple)) and \
            not isinstance(caches_many, (list, tuple)):
        caches_many = [jax.tree_util.tree_map(lambda c: c[li], caches_many)
                       for li in range(len(caches))]

    def ins(pool, many):
        if pool.ndim == 5:      # stacked (L, B, H, S, ·)
            return pool.at[:, slots].set(many)
        return pool.at[slots].set(many)   # (B, H, S, ·)

    return jax.tree_util.tree_map(ins, caches, caches_many)


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def _recenter_pool_jit(caches, delta, cfg: MagnetoConfig):
    """Slide each slot's xPos decay center forward by ``delta`` (B,)
    positions (nn.decoder.recenter_caches over the donated pool). Rows with
    delta 0 are exact no-ops: bf16 keys multiply by 1.0, and int8 keys
    re-quantize to identical codes (dequantized values are exactly
    representable, so absmax and codes round-trip losslessly)."""
    return dec.recenter_caches(caches, delta, cfg)


def _decode_core(params, last_tokens, caches, index, active, rng,
                 cfg: MagnetoConfig, scfg: SamplingConfig,
                 pad_id: int = 1, double_scale: bool = False,
                 shared=None, rows=None, center=None,
                 interpret: bool = False):
    """One decode step for every slot. Inactive slots still compute (static
    shapes) but their index does not advance and their token is ignored.

    ``shared = (shared_caches, shared_on, pos_offset)``: the engine's
    shared-prefix segment (see ServeEngine.register_prefix(share=True)) —
    flagged slots attend it in place of per-slot prefix cache copies and
    their positions shift by its length.

    ``center`` (B,): per-slot xPos decay center — rolling-window serving
    re-centers each slot's cached keys every few thousand steps
    (ServeEngine._maybe_recenter / nn.decoder.recenter_caches) so the
    per-dim ``zeta**((pos-center)/scale_base)`` scales stay in numeric
    range however long the generation runs (exact algebra: the center
    cancels in q·k)."""
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
                               xpos_center=center,
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
                     shared=None, rows=None, center=None,
                     interpret: bool = False):
    # The engine holds the pool in its decode-native layout — a per-layer
    # LIST when unrolled decode is on (run_layers branches on the type), the
    # stacked array otherwise — so no per-dispatch unstack/restack copies
    # happen here. An unstack/restack wrap at this boundary was measured to
    # REGRESS 1024-prompt serving (148.3 vs 174.1 tok/s scan): two pool
    # copies per single-step dispatch outweigh the unroll win.
    return _decode_core(params, last_tokens, caches, index, active, rng,
                        cfg, scfg, pad_id=pad_id, double_scale=double_scale,
                        shared=shared, rows=rows, center=center,
                        interpret=interpret)


@functools.partial(jax.jit, static_argnames=("cfg", "scfg", "block",
                                             "pad_id", "double_scale",
                                             "interpret"),
                   donate_argnums=(2,))
def _decode_block_jit(params, last_tokens, caches, index, active, rng,
                      cfg: MagnetoConfig, scfg: SamplingConfig, block: int,
                      pad_id: int = 1, double_scale: bool = False,
                      shared=None, rows=None, center=None,
                      interpret: bool = False):
    """``block`` decode steps for every slot in ONE dispatch (lax.scan over
    the single-step core, token feedback on device). Amortizes the per-step
    dispatch/link overhead — on the remote chip one dispatch costs ~3 ms on
    top of a ~7-10 ms flagship decode step. Returns (B, block) tokens and
    their (B, block) log-probs. ``center`` is constant across the block —
    the engine re-centers only BETWEEN dispatches (the recenter interval
    has thousands of steps of slack, so a block's worth of drift is free)."""
    def body(carry, k):
        last, caches, index = carry
        nxt, lp, caches, index = _decode_core(
            params, last, caches, index, active, jax.random.fold_in(rng, k),
            cfg, scfg, pad_id=pad_id, double_scale=double_scale,
            shared=shared, rows=rows, center=center, interpret=interpret)
        return (nxt, caches, index), (nxt, lp)

    # A per-layer-list pool (unrolled-decode engines) carries through the
    # token scan as-is: each layer's in-place cache update aliases instead
    # of the stacked carry's per-layer dynamic-slice copies (~4x cache
    # bytes per STEP — see nn.decoder.run_layers).
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


# in-place cache scatters: donate both cache pools (each pool arrives in
# its decode-native layout — per-layer list when unrolled decode is on)
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

    # per-layer-list pools carry through the round scan as-is (see
    # _decode_block_jit)
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
