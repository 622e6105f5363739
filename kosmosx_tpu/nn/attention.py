"""Magneto-style multihead self-attention (sub-LN, xPos, multiway) for TPU.

Functional re-design of the attention used by the reference decoder (the
torchscale ``MultiheadAttention`` instantiated through ``Decoder`` at
/root/reference/kosmosx/model.py:186-191 with ``subln=True, xpos_rel_pos=True,
multiway=True``). Semantics replicated:

- separate q/k/v/out projections (embed_dim -> embed_dim, bias=True),
  xavier-uniform init with gain 1/sqrt(2) for q/k/v, gain 1 for out;
- q scaled by head_dim**-0.5 *before* xPos (multiplicative, commutes);
- xPos rotation+decay applied per head: keys downscaled, queries upscaled;
- softmax in fp32;
- sub-LN: an extra LayerNorm on the merged attention output *before* the out
  projection (the Magneto "inner_attn_ln");
- multiway: k/q/v/out projections and inner LN duplicated into two experts
  routed by a static position split (nn/multiway.py).

The hot path runs the Pallas flash-attention kernel (ops/flash_attention.py);
a jnp path exists for short sequences, attention-dropout training, and
KV-cache decode steps.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from kosmosx_tpu.core import initializers as init
from kosmosx_tpu.nn import layers
from kosmosx_tpu.nn.multiway import init_multiway, multiway_apply
from kosmosx_tpu.nn.xpos import apply_xpos
from kosmosx_tpu.ops.flash_attention import flash_attention

# Sequences shorter than this stay on the plain-jnp path: a 24-layer model at
# tiny lengths is launch-latency bound and XLA's fused attention wins.
_FLASH_MIN_LEN = 256


def init_self_attention(key, embed_dim: int, heads: int, *, subln: bool = True,
                        multiway: bool = False) -> Dict[str, Any]:
    kq, kk, kv, ko, kl = jax.random.split(key, 5)
    gain = 1.0 / math.sqrt(2.0)

    def make_linear(g):
        def f(k_):
            return {"w": init.xavier_uniform(k_, (embed_dim, embed_dim), g),
                    "b": init.zeros((embed_dim,))}
        return f

    params = {
        "q": init_multiway(multiway, kq, make_linear(gain)),
        "k": init_multiway(multiway, kk, make_linear(gain)),
        "v": init_multiway(multiway, kv, make_linear(gain)),
        "out": init_multiway(multiway, ko, make_linear(1.0)),
    }
    if subln:
        params["inner_ln"] = init_multiway(
            multiway, kl, lambda k_: layers.init_layer_norm(embed_dim))
    return params


def _split_heads(x, heads: int):
    b, l, d = x.shape
    return x.reshape(b, l, heads, d // heads).transpose(0, 2, 1, 3)  # (B,H,L,hd)


def _merge_heads(x):
    b, h, l, hd = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * hd)


def _quantize_kv(x):
    """(B, H, L, hd) -> (int8 codes, (B, H, L, 1) fp32 scales): symmetric
    per-position-per-head quantization (absmax/127)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    codes = jnp.clip(jnp.round(x.astype(jnp.float32) / scale),
                     -127, 127).astype(jnp.int8)
    return codes, scale


def _jnp_attention(q, k, v, *, causal: bool, kv_len: Optional[jax.Array],
                   attn_dropout: float, rng, segment_q=None, segment_kv=None,
                   q_offset: Optional[jax.Array] = None,
                   k_scale=None, v_scale=None,
                   shared_k=None, shared_v=None, shared_on=None):
    """(B,H,Lq,hd) attention in fp32 softmax. ``kv_len`` masks cache positions
    >= kv_len (decode path); ``segment_*`` mask cross-segment attention;
    ``q_offset`` (B,) gives the absolute position of q[:, 0] for causal
    alignment against a cache (prefill writes at an offset).

    ``k_scale``/``v_scale`` (B,H,Lk,1): when given, k/v are int8 codes of an
    int8 KV cache. The int8->compute-dtype convert rides the matmul operand
    (XLA fuses it — same pattern as the W8 weight path, BASELINE.md) and the
    scales apply to the score columns / the probability rows, so the
    dequantized cache is never materialized in HBM.

    ``shared_k``/``shared_v`` (1,H,P,hd): a prefix KV segment shared by the
    whole batch WITHOUT per-row copies (one broadcast matmul operand —
    RelayAttention-style serving of a common system prompt). It occupies
    absolute positions [0, P) BEFORE the per-row cache, is always fully
    visible to every query, and is gated per row by ``shared_on`` (B,) —
    rows not using the shared segment mask its columns out. The softmax
    runs ONCE over the concatenated [shared | own] scores (exact algebra,
    not an approximation)."""
    lq, lk = q.shape[-2], k.shape[-2]
    if k_scale is not None:
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k.astype(q.dtype),
                       preferred_element_type=jnp.float32)
        s = s * jnp.swapaxes(k_scale, -1, -2)  # (B,H,1,Lk) column scales
    else:
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       preferred_element_type=jnp.float32)
    neg = jnp.finfo(jnp.float32).min
    mask = None
    if causal and (lq > 1 or q_offset is not None):
        if q_offset is not None:
            qi = (q_offset[:, None, None, None]
                  + jnp.arange(lq)[None, None, :, None])  # (B,1,Lq,1)
            kj = jnp.arange(lk)[None, None, None, :]
            mask = kj <= qi
        else:
            qi = jnp.arange(lq)[:, None] + (lk - lq)
            kj = jnp.arange(lk)[None, :]
            mask = (kj <= qi)[None, None]
    if kv_len is not None:
        valid = jnp.arange(lk)[None, None, None, :] < kv_len[:, None, None, None]
        mask = valid if mask is None else mask & valid
    if segment_q is not None:
        seg = segment_q[:, None, :, None] == segment_kv[:, None, None, :]
        mask = seg if mask is None else mask & seg
    if mask is not None:
        s = jnp.where(mask, s, neg)
    if shared_k is not None:
        # scores over the shared segment: broadcast (1,H,P,hd) keys against
        # every row's queries — no per-row materialization of the prefix
        ss = jnp.einsum("bhqd,zhkd->bhqk", q, shared_k,
                        preferred_element_type=jnp.float32)
        if shared_on is not None:
            ss = jnp.where(shared_on[:, None, None, None], ss, neg)
        s = jnp.concatenate([ss, s], axis=-1)
    p = jax.nn.softmax(s, axis=-1)
    if rng is not None and attn_dropout > 0.0:
        p = layers.dropout(p, attn_dropout, rng)
    if shared_k is not None:
        ps, p = p[..., :shared_k.shape[-2]], p[..., shared_k.shape[-2]:]
        o_shared = jnp.einsum("bhqk,zhkd->bhqd", ps.astype(shared_v.dtype),
                              shared_v)
    else:
        o_shared = None
    if v_scale is not None:
        # fold the column scales into p, keep v as int8 matmul operand
        p = p * jnp.swapaxes(v_scale, -1, -2)
        o = jnp.einsum("bhqk,bhkd->bhqd", p.astype(q.dtype),
                       v.astype(q.dtype))
    else:
        o = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)
    return o if o_shared is None else o + o_shared.astype(o.dtype)


def _gathered_sp_attention(q, k, v, axis_name, *, shard, n_shards, zigzag,
                           causal, segment_ids, attn_dropout, rng):
    """Sequence-parallel attention via all-gathered K/V (the attention-
    dropout fallback). q is the local shard (B, H, Ll, hd), already
    xPos-rotated; k/v likewise (rotated with their own global offsets, so
    gathering them is sound). Position ids handle both layouts: contiguous
    shards and the zigzag chunk order."""
    from jax import lax

    from kosmosx_tpu.parallel.ring_attention import zigzag_position_offsets

    b, h, ll, hd = q.shape
    if zigzag:
        q_pos = zigzag_position_offsets(shard, ll, n_shards) + jnp.arange(ll)
    else:
        q_pos = shard * ll + jnp.arange(ll)
    k_pos = lax.all_gather(q_pos, axis_name, axis=0, tiled=True)  # (Lg,)
    k_g = lax.all_gather(k, axis_name, axis=2, tiled=True)
    v_g = lax.all_gather(v, axis_name, axis=2, tiled=True)

    s = jnp.einsum("bhqd,bhkd->bhqk", q, k_g,
                   preferred_element_type=jnp.float32)
    neg = jnp.finfo(jnp.float32).min
    mask = None
    if causal:
        mask = (k_pos[None, None, None, :] <= q_pos[None, None, :, None])
    if segment_ids is not None:
        seg_kv = lax.all_gather(segment_ids, axis_name, axis=1, tiled=True)
        seg = (segment_ids[:, None, :, None] == seg_kv[:, None, None, :])
        mask = seg if mask is None else mask & seg
    if mask is not None:
        s = jnp.where(mask, s, neg)
    p = jax.nn.softmax(s, axis=-1)
    if attn_dropout > 0.0 and rng is not None:
        p = layers.dropout(p, attn_dropout, rng)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v_g.dtype), v_g)


def self_attention(params, x, *, heads: int, subln: bool = True,
                   multiway: bool = False, split: Optional[int] = None,
                   causal: bool = True,
                   xpos: bool = True, xpos_scale_base: int = 512,
                   use_flash: bool = True,
                   flash_block_q: int = 512, flash_block_kv: int = 512,
                   segment_ids: Optional[jax.Array] = None,
                   attn_dropout: float = 0.0,
                   rng: Optional[jax.Array] = None,
                   cache: Optional[Dict[str, jax.Array]] = None,
                   cache_index: Optional[jax.Array] = None,
                   prefill: bool = False,
                   shared_kv: Optional[Dict[str, jax.Array]] = None,
                   shared_on: Optional[jax.Array] = None,
                   pos_offset: Optional[jax.Array] = None,
                   kv_window: int = 0, kv_sink: int = 4,
                   decode_attn_kernel: bool = False,
                   xpos_center: Optional[jax.Array] = None,
                   dtype=None,
                   interpret: bool = False,
                   sequence_axis: Optional[str] = None,
                   sequence_schedule: str = "ring",
                   ) -> Tuple[jax.Array, Optional[Dict[str, jax.Array]]]:
    """Self-attention over ``x`` (B, L, D).

    KV-cache decode: pass ``cache = {"k": (B,H,Lmax,hd), "v": ...}`` and
    ``cache_index`` (B,)-or-scalar int32 = number of tokens already cached.
    New keys/values are written at ``cache_index`` and attention runs over the
    full cache with a validity mask. Returns (out, updated_cache).

    xPos under caching uses absolute-position offsets with a *fixed* center 0
    so cached keys stay valid across steps (see nn/xpos.py).

    Shared-prefix serving: ``shared_kv = {"k","v"} (1,H,P,hd)`` is a prefix
    KV segment at absolute positions [0, P) attended by every row whose
    ``shared_on`` flag is set, WITHOUT per-row cache copies; the row's own
    cache then holds positions P..: ``pos_offset`` (B,) carries the P shift
    so xPos rotations stay absolute while cache writes stay local.
    """
    b, l, d = x.shape
    hd = d // heads

    def proj(p, v_):
        return multiway_apply(multiway, lambda pp, xx: layers.linear(pp, xx, dtype=dtype),
                              p, v_, split)

    q = proj(params["q"], x) * (hd ** -0.5)
    k = proj(params["k"], x)
    v = proj(params["v"], x)
    q, k, v = _split_heads(q, heads), _split_heads(k, heads), _split_heads(v, heads)

    if cache is None and sequence_axis is not None:
        # context parallelism: sequence sharded over `sequence_axis`; K/V
        # shards rotate around the ring (parallel/ring_attention.py).
        # segment_ids (padding / packed docs) ride the ring with K/V.
        from kosmosx_tpu.parallel.ring_attention import (
            ring_flash_attention, zigzag_ring_flash_attention)

        n_shards = jax.lax.psum(1, sequence_axis)
        shard = jax.lax.axis_index(sequence_axis)
        zigzag = sequence_schedule == "zigzag"
        center = (l * n_shards) // 2  # cancels in q.k; keeps fp ranges sane

        def rotate(t, downscale):
            if not xpos:
                return t
            if zigzag:
                # shard holds global chunks (i, 2S-1-i), each l//2 long
                c = l // 2
                lo = apply_xpos(t[:, :, :c], scale_base=xpos_scale_base,
                                downscale=downscale, center=center,
                                offset=shard * c)
                hi = apply_xpos(t[:, :, c:], scale_base=xpos_scale_base,
                                downscale=downscale, center=center,
                                offset=(2 * n_shards - 1 - shard) * c)
                return jnp.concatenate([lo, hi], axis=2)
            return apply_xpos(t, scale_base=xpos_scale_base,
                              downscale=downscale, center=center,
                              offset=shard * l)

        q = rotate(q, False)
        k = rotate(k, True)
        if rng is not None and attn_dropout > 0.0:
            # Exact attention-dropout fallback: all-gather K/V (+ ids) over
            # the sequence axis and run the jnp path with global position
            # masking. O(L_global) memory per device — dropout training only;
            # the ring kernels stay dropout-free (in-kernel RNG would be
            # needed to drop unnormalized tiles consistently).
            o = _gathered_sp_attention(
                q, k, v, sequence_axis, shard=shard, n_shards=n_shards,
                zigzag=zigzag, causal=causal, segment_ids=segment_ids,
                attn_dropout=attn_dropout,
                rng=jax.random.fold_in(rng, shard))
        elif zigzag:
            o = zigzag_ring_flash_attention(
                q, k, v, sequence_axis,
                q_segment_ids=segment_ids, kv_segment_ids=segment_ids,
                block_q=min(flash_block_q, l // 2),
                block_kv=min(flash_block_kv, l // 2),
                interpret=interpret)
        else:
            o = ring_flash_attention(
                q, k, v, sequence_axis, causal=causal,
                q_segment_ids=segment_ids, kv_segment_ids=segment_ids,
                block_q=min(flash_block_q, l),
                block_kv=min(flash_block_kv, l),
                interpret=interpret)
        o = o.astype(x.dtype)
        new_cache = None
    elif cache is None:
        new_cache = None
        seg_q = seg_kv = segment_ids
        use_flash_here = (use_flash and l >= _FLASH_MIN_LEN
                          and not (rng is not None and attn_dropout > 0.0))
        if use_flash_here:
            # xPos rotation+decay fused into the kernel: q/k tiles rotate in
            # VMEM instead of two fp32 HBM passes per layer
            o = flash_attention(q, k, v, causal=causal, sm_scale=1.0,
                                q_segment_ids=seg_q, kv_segment_ids=seg_kv,
                                block_q=flash_block_q, block_kv=flash_block_kv,
                                interpret=interpret,
                                xpos_scale_base=(xpos_scale_base if xpos
                                                 else None))
        else:
            if xpos:
                # full-seq path: torchscale centers at L//2 (cancels in q.k)
                center = l // 2
                q = apply_xpos(q, scale_base=xpos_scale_base, downscale=False, center=center)
                k = apply_xpos(k, scale_base=xpos_scale_base, downscale=True, center=center)
            o = _jnp_attention(q, k, v, causal=causal, kv_len=None,
                               attn_dropout=attn_dropout, rng=rng,
                               segment_q=seg_q, segment_kv=seg_kv)
            o = o.astype(x.dtype)
    else:
        # decode: x is the new chunk (usually L=1); cache holds past K/V
        idx = jnp.asarray(cache_index, jnp.int32)
        if idx.ndim == 0:
            idx = jnp.broadcast_to(idx, (b,))
        if xpos:
            # offset = ABSOLUTE position of the new tokens (cache index plus
            # any shared-prefix shift); center is fixed at 0 across steps
            # unless the caller slides it (``xpos_center``, rolling-window
            # generation — cached keys must have been rescaled to the same
            # center via xpos.recenter_scale, see nn/decoder.recenter_caches)
            center = 0 if xpos_center is None else xpos_center
            rot = idx if pos_offset is None else idx + pos_offset
            q = apply_xpos(q, offset=rot, scale_base=xpos_scale_base,
                           downscale=False, center=center)
            k = apply_xpos(k, offset=rot, scale_base=xpos_scale_base,
                           downscale=True, center=center)
        # zero out invalid (padded) chunk positions before the additive
        # scatter — cache slots must stay exactly-once-written
        if segment_ids is not None:
            valid = (segment_ids >= 0).astype(k.dtype)[:, None, :, None]
            k = k * valid
            v = v * valid
        # scatter new k/v into the cache at position idx. An indexed .set
        # compiles to an in-place scatter on the donated loop carry — O(L)
        # HBM writes per step, vs the O(Lmax) full-cache rewrite of a
        # one-hot-matmul update. Slots at/after a row's write position are
        # invisible until written (kv_len mask below), so overwrite is safe.
        ring = kv_window > 0 and l == 1
        if ring:
            # StreamingLLM-style rolling cache: the first kv_sink positions
            # are pinned (attention sinks), the rest is a ring buffer — the
            # write position wraps, every written slot holds a strictly
            # OLDER absolute position than the query (so no causal mask by
            # slot index), and xPos stays exact because keys were rotated
            # at their absolute positions when written.
            w, s = kv_window, kv_sink
            write = jnp.where(idx < w, idx, s + jnp.mod(idx - s, w - s))
            pos = write[:, None] + jnp.arange(l)[None, :]
            kv_valid = jnp.minimum(idx + l, w)
            q_off = None
        else:
            pos = idx[:, None] + jnp.arange(l)[None, :]       # (B, L)
            kv_valid = idx + l
            q_off = idx
        b_idx = jnp.arange(b)[:, None]                        # (B, 1)
        quant_cache = "k_scale" in cache
        if quant_cache:
            # int8 KV cache (cfg.kv_cache_dtype): quantize on write
            kq, ks = _quantize_kv(k)
            vq, vs = _quantize_kv(v)
            new_cache = {
                "k": cache["k"].at[b_idx, :, pos, :].set(
                    jnp.swapaxes(kq, 1, 2)),
                "k_scale": cache["k_scale"].at[b_idx, :, pos, :].set(
                    jnp.swapaxes(ks, 1, 2)),
                "v": cache["v"].at[b_idx, :, pos, :].set(
                    jnp.swapaxes(vq, 1, 2)),
                "v_scale": cache["v_scale"].at[b_idx, :, pos, :].set(
                    jnp.swapaxes(vs, 1, 2)),
            }
        else:
            # advanced indices (B,L) around the H slice put (B, L) in front:
            # value layout (B, L, H, hd)
            k_cache = cache["k"].at[b_idx, :, pos, :].set(jnp.swapaxes(k, 1, 2))
            v_cache = cache["v"].at[b_idx, :, pos, :].set(jnp.swapaxes(v, 1, 2))
            new_cache = {"k": k_cache, "v": v_cache}
        kv_len = kv_valid
        if prefill and use_flash and l >= _FLASH_MIN_LEN \
                and shared_kv is None:
            # prefill writes at index 0 (caller's contract): attention over
            # the cache == causal attention over the chunk itself, so the
            # Pallas kernel runs instead of materializing fp32 (L, Lmax)
            # scores per layer (xPos already applied above, center 0)
            o = flash_attention(q, k, v, causal=True, sm_scale=1.0,
                                q_segment_ids=segment_ids,
                                kv_segment_ids=segment_ids,
                                block_q=flash_block_q, block_kv=flash_block_kv,
                                interpret=interpret)
        elif (decode_attn_kernel and l == 1 and shared_kv is None
              and cache["k"].shape[2] % 8 == 0
              and cache["k"].shape[3] % 8 == 0):
            # Pallas single-query kernel: VPU cache streaming + DMA skip past
            # kv_len (ops/decode_attention.py). At L=1 the causal mask is
            # subsumed by the kv_len mask (every cached slot holds a
            # strictly older position — append mode writes at idx with
            # kv_len = idx+1; ring mode only ever holds older slots).
            from kosmosx_tpu.ops.decode_attention import decode_attention
            o = decode_attention(
                q, new_cache["k"], new_cache["v"], kv_len,
                k_scale=new_cache.get("k_scale"),
                v_scale=new_cache.get("v_scale"),
                interpret=interpret)
        else:
            o = _jnp_attention(q, new_cache["k"], new_cache["v"],
                               causal=causal,
                               kv_len=kv_len, attn_dropout=0.0, rng=None,
                               q_offset=q_off,
                               k_scale=(new_cache["k_scale"] if quant_cache
                                        else None),
                               v_scale=(new_cache["v_scale"] if quant_cache
                                        else None),
                               shared_k=(shared_kv["k"].astype(q.dtype)
                                         if shared_kv is not None else None),
                               shared_v=(shared_kv["v"]
                                         if shared_kv is not None else None),
                               shared_on=shared_on)
        o = o.astype(x.dtype)

    o = _merge_heads(o)
    if subln and "inner_ln" in params:
        o = multiway_apply(multiway, layers.layer_norm, params["inner_ln"], o, split)
    o = proj(params["out"], o)
    return o, new_cache
