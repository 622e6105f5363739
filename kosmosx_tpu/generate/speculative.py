"""Speculative decoding: a small draft model proposes, the target verifies.

Decode is HBM-bandwidth-bound (BASELINE.md: the flagship reads ~2.6 GB of
weights per token), so trading one target forward per token for one target
forward per ``gamma+1`` tokens is a near-linear win whenever the draft's
guesses are accepted. The reference has no generation loop at all
(SURVEY.md §1), let alone speculation.

TPU-first design — the whole loop is ONE jitted program:
- draft: ``lax.scan`` over ``gamma`` single-token cached decode steps;
- verify: ONE multi-token cached forward of the target over
  ``[carry, d_1..d_gamma]`` (the chunked-decode path of nn/attention.py:
  new K/V scattered at per-batch indices, causal over the valid cache);
- accept (greedy): the longest prefix where the draft token equals the
  target argmax; the target's own argmax at the first mismatch (or the
  bonus position) becomes the next round's carry token — so every round
  commits between 1 and gamma+1 TARGET-distribution tokens;
- accept (temperature sampling): Leviathan-style rejection sampling —
  accept d_i with prob min(1, p_t(d_i)/p_d(d_i)); on rejection resample
  from max(0, p_t - p_d) renormalized. Greedy outputs are bit-identical
  to plain ``generate_text``; sampled outputs are distributed as the
  target's (top-k/top-p filtering is not supported in speculative mode).
- rounds: ``lax.while_loop`` until every row has committed
  ``max_new_tokens`` (stale cache entries past a row's index are never
  attended, so rejected drafts need no rollback — the next round simply
  overwrites them).

Both models share the tokenizer/vocab; the draft is typically the same
architecture at a fraction of the depth/width (e.g. 2L/512d vs 24L/2048d).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from kosmosx_tpu.core.config import MagnetoConfig
from kosmosx_tpu.generate.sampler import (SamplingConfig, _prefill,
                                           sample_logits, token_logprob)
from kosmosx_tpu.nn import decoder as dec


def _decode_logits(params, cfg: MagnetoConfig, tokens, caches, index,
                   double_scale: bool = False, shared=None):
    """Cached forward of ``tokens`` (B, L) at per-batch ``index`` (B,).
    Returns (logits (B, L, V), caches). ``double_scale`` replicates the
    reference Kosmos embedding quirk (SURVEY.md §2.6.1) so speculative
    serving of a parity-mode Kosmos matches its plain decode path.
    ``shared = (shared_caches, shared_on, pos_offset)``: a broadcast
    shared-prefix KV segment (serve/engine.py register_prefix(share=True))
    attended by flagged rows with positions shifted by its length."""
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
                               cache_index=index,
                               shared_caches=shared_caches,
                               shared_on=shared_on, pos_offset=pos_offset)
    return dec.output_logits(params, h, cfg).astype(jnp.float32), caches


def _probs(logits, temperature):
    return jax.nn.softmax(logits / jnp.maximum(temperature, 1e-6), axis=-1)


def spec_round(params_t, params_d, cfg_t: MagnetoConfig, cfg_d: MagnetoConfig,
               scfg: SamplingConfig, gamma: int,
               carry_tok, index, caches_t, caches_d, rng,
               double_scale_t: bool = False, index_d=None,
               shared_t=None, shared_d=None):
    """One speculative round over a (B,) batch/slot-pool: draft gamma
    tokens, verify in one chunked target forward, accept.

    Returns ``(emit, emit_lp, n_acc, carry_next, caches_t, caches_d,
    rng)`` where ``emit`` (B, gamma+1) holds the round's committable tokens
    and ``emit_lp`` their raw-model target log-probs
    (d_1..d_{n_acc}, then the correction/bonus token at position n_acc;
    entries past that are junk) and ``carry_next`` is the token to feed
    next round. The caller decides how many to actually commit (done/EOS/
    budget masking) and must advance ``index`` by that count itself.
    Shared by speculative_generate and the serving engine.

    ``index_d``: the DRAFT's per-row cache index when it differs from the
    target's — multimodal serving: the target cache holds spliced image
    embeddings the text-only draft never saw, so the draft runs at
    ``index - n_images*image_embed_len`` (the caller advances both by the
    committed count). Defaults to ``index``.
    """
    b = carry_tok.shape[0]
    if index_d is None:
        index_d = index

    # Draft gamma tokens via single-token cached steps. The scan runs
    # gamma+1 steps (last proposal discarded) so the draft cache ends
    # holding K/V for the WHOLE chunk [carry, d_1..d_gamma]: on full
    # acceptance the next round starts past d_gamma, and a cache hole there
    # silently corrupts every later draft (caught by the self-draft
    # acceptance test).
    def draft_step(c, r):
        tok, caches_d, idx = c
        logits, caches_d = _decode_logits(params_d, cfg_d, tok[:, None],
                                          caches_d, idx, shared=shared_d)
        logits = logits[:, 0]
        nxt = sample_logits(logits, r, scfg)
        pd_row = _probs(logits, scfg.temperature)
        return (nxt, caches_d, idx + 1), (nxt, pd_row)

    rng, rd = jax.random.split(rng)
    (_, caches_d, _), (d_toks_full, pd_rows) = jax.lax.scan(
        draft_step, (carry_tok, caches_d, index_d),
        jax.random.split(rd, gamma + 1))
    d_toks_full = jnp.swapaxes(d_toks_full, 0, 1)         # (B, gamma+1)
    d_toks = d_toks_full[:, :gamma]
    p_d_all = jnp.swapaxes(pd_rows, 0, 1)                 # (B, gamma+1, V)
    d_probs = p_d_all[jnp.arange(b)[:, None],
                      jnp.arange(gamma)[None, :], d_toks]

    # one multi-token target verify over [carry, d_1..d_gamma]
    chunk = jnp.concatenate([carry_tok[:, None], d_toks], axis=1)
    logits_t, caches_t = _decode_logits(params_t, cfg_t, chunk,
                                        caches_t, index,
                                        double_scale_t,
                                        shared=shared_t)  # (B, g+1, V)

    if scfg.greedy:
        g = jnp.argmax(logits_t, axis=-1).astype(jnp.int32)   # (B, g+1)
        match = d_toks == g[:, :gamma]
        n_acc = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1), axis=1)
        corrections = g
    else:
        # rejection sampling: accept d_i with prob min(1, p_t/p_d)
        rng, ra, rr = jax.random.split(rng, 3)
        p_t_all = _probs(logits_t, scfg.temperature)          # (B, g+1, V)
        bi = jnp.arange(b)[:, None]
        p_t = p_t_all[bi, jnp.arange(gamma)[None, :], d_toks]
        u = jax.random.uniform(ra, (b, gamma))
        accept = u < jnp.minimum(1.0, p_t / jnp.maximum(d_probs, 1e-20))
        n_acc = jnp.sum(jnp.cumprod(accept.astype(jnp.int32), axis=1), axis=1)
        # residual distribution at the first rejected position; at the
        # bonus position (all accepted) the residual degenerates to p_t
        sel = jnp.minimum(n_acc, gamma)
        p_t_sel = p_t_all[jnp.arange(b), sel]                 # (B, V)
        p_d_sel = p_d_all[jnp.arange(b), sel]
        resid = jnp.maximum(p_t_sel - jnp.where((sel < gamma)[:, None],
                                                p_d_sel, 0.0), 0.0)
        resid = resid / jnp.maximum(jnp.sum(resid, -1, keepdims=True), 1e-20)
        corr = jax.random.categorical(rr, jnp.log(resid + 1e-20), axis=-1
                                      ).astype(jnp.int32)
        corrections = jnp.broadcast_to(corr[:, None], (b, gamma + 1))

    carry_next = corrections[jnp.arange(b), jnp.minimum(n_acc, gamma)]
    emit = jnp.concatenate([d_toks, carry_next[:, None]], axis=1)
    emit = emit.at[jnp.arange(b), n_acc].set(carry_next)
    # target log-probs of the emitted window (position j's logits scored
    # the token emitted at j — d_{j+1} or the correction/bonus)
    emit_lp = token_logprob(logits_t, emit)
    return emit, emit_lp, n_acc, carry_next, caches_t, caches_d, rng


@functools.partial(jax.jit,
                   static_argnames=("cfg_t", "cfg_d", "scfg", "gamma",
                                    "max_len"))
def _speculative_jit(params_t, params_d, prompt, prompt_lengths, rng,
                     cfg_t: MagnetoConfig, cfg_d: MagnetoConfig,
                     scfg: SamplingConfig, gamma: int, max_len: int):
    b, lp = prompt.shape
    fill = scfg.eos_id if scfg.eos_id is not None else 0

    # -- prefill both models over the prompt ---------------------------------
    seg = jnp.where(jnp.arange(lp)[None, :] < prompt_lengths[:, None], 0, -1
                    ).astype(jnp.int32)
    caches_t = dec.init_cache(cfg_t, batch=b, max_len=max_len)
    x_t, _ = dec.forward_embedding(params_t, cfg_t, prompt)
    last_logits, caches_t = _prefill(params_t, cfg_t, x_t, caches_t,
                                     prompt_lengths, seg)
    caches_d = dec.init_cache(cfg_d, batch=b, max_len=max_len)
    x_d, _ = dec.forward_embedding(params_d, cfg_d, prompt)
    _, caches_d = _prefill(params_d, cfg_d, x_d, caches_d,
                           prompt_lengths, seg)

    # per-layer buffers for the unrolled decode loop in every round's
    # draft scan + verify (one-time unstack outside the while_loop; the
    # caches are not returned, so no restack) — see nn/decoder
    if dec.wants_unrolled_decode(cfg_t, caches_t):
        caches_t = dec.unstack_caches(caches_t, cfg_t)
    if dec.wants_unrolled_decode(cfg_d, caches_d):
        caches_d = dec.unstack_caches(caches_d, cfg_d)

    rng, r0 = jax.random.split(rng)
    carry_tok = sample_logits(last_logits, r0, scfg)      # committed token 0
    out = jnp.full((b, scfg.max_new_tokens), fill, jnp.int32)
    out = out.at[:, 0].set(carry_tok)
    out_pos = jnp.ones((b,), jnp.int32)
    done = (carry_tok == scfg.eos_id if scfg.eos_id is not None
            else jnp.zeros((b,), bool))
    index = prompt_lengths                                 # tokens cached

    def round_body(state):
        out, out_pos, carry_tok, index, caches_t, caches_d, done, rng, \
            n_rounds, n_accepted, n_proposed = state

        emit, _, n_acc, carry_next, caches_t, caches_d, rng = spec_round(
            params_t, params_d, cfg_t, cfg_d, scfg, gamma,
            carry_tok, index, caches_t, caches_d, rng)
        n_emit = jnp.where(done, 0, n_acc + 1)

        # eos truncation: tokens after the first eos in the emitted window
        # are not committed
        if scfg.eos_id is not None:
            is_eos = emit == scfg.eos_id
            before_eos = jnp.cumsum(
                jnp.cumsum(is_eos.astype(jnp.int32), axis=1), axis=1) <= 1
            upto_eos = jnp.sum(before_eos.astype(jnp.int32), axis=1)
            n_emit = jnp.minimum(n_emit, upto_eos)

        # scatter the committed tokens into the output buffer
        offs = jnp.arange(gamma + 1)[None, :]
        pos = out_pos[:, None] + offs
        valid = (offs < n_emit[:, None]) & (pos < scfg.max_new_tokens)
        pos = jnp.where(valid, pos, scfg.max_new_tokens)  # drop out of range
        out = out.at[jnp.arange(b)[:, None], pos].set(
            jnp.where(valid, emit, fill), mode="drop")

        out_pos = out_pos + n_emit
        index = index + n_emit
        if scfg.eos_id is not None:
            hit = jnp.any((emit == scfg.eos_id) & (offs < n_emit[:, None]),
                          axis=1)
            done = done | hit
        done = done | (out_pos >= scfg.max_new_tokens)
        carry_tok = jnp.where(done, carry_tok, carry_next)
        running = jnp.sum((~done).astype(jnp.int32))
        return (out, out_pos, carry_tok, index, caches_t, caches_d, done,
                rng, n_rounds + 1,
                n_accepted + jnp.sum(jnp.where(done, 0, n_acc)),
                n_proposed + running * gamma)

    def cond(state):
        return ~jnp.all(state[6])

    state = (out, out_pos, carry_tok, index, caches_t, caches_d, done, rng,
             jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
             jnp.zeros((), jnp.int32))
    state = jax.lax.while_loop(cond, round_body, state)
    out, n_rounds, n_accepted, n_proposed = state[0], state[8], state[9], state[10]
    return out, n_rounds, n_accepted, n_proposed


def speculative_generate(params_target, params_draft, cfg_target: MagnetoConfig,
                         cfg_draft: MagnetoConfig, prompt: jax.Array,
                         sampling: Optional[SamplingConfig] = None, *,
                         gamma: int = 4,
                         prompt_lengths: Optional[jax.Array] = None,
                         rng: Optional[jax.Array] = None
                         ) -> Tuple[jax.Array, dict]:
    """prompt (B, Lp) -> (generated ids (B, max_new_tokens), stats).

    Greedy outputs are identical to ``generate_text`` on the target alone;
    temperature-sampled outputs follow the target's distribution. ``stats``
    = {"rounds", "accepted", "proposed"} (host ints; acceptance rate =
    accepted/proposed).
    """
    sampling = sampling or SamplingConfig(greedy=True)
    if not sampling.greedy and (sampling.top_k > 0 or sampling.top_p < 1.0):
        raise NotImplementedError(
            "speculative decoding supports greedy or temperature sampling; "
            "top-k/top-p filtering is not implemented")
    if cfg_target.kv_window > 0 or cfg_draft.kv_window > 0:
        raise NotImplementedError(
            "speculative decoding over a rolling KV window is not "
            "implemented (the multi-token verify bypasses the ring); use "
            "generate_text for windowed generation")
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    b, lp = prompt.shape
    if prompt_lengths is None:
        prompt_lengths = jnp.full((b,), lp, jnp.int32)
    # headroom: the last round may scatter gamma speculative cache entries
    max_len = lp + sampling.max_new_tokens + gamma + 1
    for cfg in (cfg_target, cfg_draft):
        if max_len > cfg.max_target_positions:
            raise ValueError(
                f"prompt + max_new_tokens + gamma = {max_len} exceeds the "
                f"position table ({cfg.max_target_positions}); raise "
                f"max_positions")
    out, n_rounds, n_accepted, n_proposed = _speculative_jit(
        params_target, params_draft, prompt, prompt_lengths, rng,
        cfg_target, cfg_draft, sampling, int(gamma), int(max_len))
    return out, {"rounds": int(n_rounds), "accepted": int(n_accepted),
                 "proposed": int(n_proposed)}
