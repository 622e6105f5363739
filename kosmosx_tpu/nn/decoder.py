"""Magneto (sub-LN) decoder stack — the framework's core language model body.

TPU-native re-design of the reference's torchscale ``Decoder`` (built at
/root/reference/kosmosx/model.py:170-191 with 24L / 2048d / 8192ffn / 32h,
``subln=True, xpos_rel_pos=True, multiway=True``). Semantics replicated from
the survey's structural analysis (SURVEY.md §2.1, §3.1):

- ``forward_embedding``: ``x = embed_scale * E[tokens] + learned_positions``
  where ``embed_scale = sqrt(embed_dim)``; returns both ``x`` and the
  position-free scaled embedding (the reference splices image embeddings into
  the latter, /root/reference/kosmosx/model.py:238-244);
- pre-LN layers: ``x += Attn(LN(x))``; ``x += FFN(LN(x))``;
- sub-LN extras: inner LayerNorm before the attention out-projection and
  between the FFN's activation and fc2;
- Magneto init: xavier projections, then fc1/fc2/out_proj/v_proj weights
  multiplied by ``sqrt(log(2*layers))``;
- FFN activation computed in fp32 (torchscale ``activation_fn(x.float())``);
- final LayerNorm after the stack, then an untied output projection
  (vocab logits), init N(0, d**-0.5) per /root/reference/kosmosx/model.py:166-167;
- multiway: every layer-internal projection/LN duplicated into two experts.

TPU-first execution:
- optional ``lax.scan`` over the (stacked-param) layer stack — one traced
  layer body regardless of depth, cutting compile time ~24x for the flagship;
- optional ``jax.checkpoint`` (remat) per layer for training memory;
- Pallas flash attention on the hot path (nn/attention.py);
- KV cache threaded functionally for autoregressive decode.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from kosmosx_tpu.core import initializers as init
from kosmosx_tpu.core.config import MagnetoConfig
from kosmosx_tpu.nn import layers
from kosmosx_tpu.nn.attention import init_self_attention, self_attention
from kosmosx_tpu.nn.moe import init_moe_ffn, moe_ffn
from kosmosx_tpu.nn.multiway import init_multiway, multiway_apply


# ---------------------------------------------------------------------------
# FFN
# ---------------------------------------------------------------------------

def init_ffn(key, embed_dim: int, ffn_dim: int, *, subln: bool = True):
    k1, k2 = jax.random.split(key)
    params = {
        "fc1": {"w": init.xavier_uniform(k1, (embed_dim, ffn_dim)),
                "b": init.zeros((ffn_dim,))},
        "fc2": {"w": init.xavier_uniform(k2, (ffn_dim, embed_dim)),
                "b": init.zeros((embed_dim,))},
    }
    if subln:
        params["ffn_ln"] = layers.init_layer_norm(ffn_dim)
    return params


def ffn(params, x, *, activation: str = "gelu", dropout_rate: float = 0.0,
        activation_dropout: float = 0.0, rng=None, dtype=None,
        activation_fp32: bool = True):
    act = layers.activation_fn(activation)
    h = layers.linear(params["fc1"], x, dtype=dtype)
    if activation_fp32:  # torchscale discipline: activation_fn(x.float())
        h = act(h.astype(jnp.float32)).astype(h.dtype)
    else:                # compute-dtype gelu (cfg.activation_fp32=False)
        h = act(h)
    if rng is not None and activation_dropout > 0.0:
        rng, sub = jax.random.split(rng)
        h = layers.dropout(h, activation_dropout, sub)
    if "ffn_ln" in params:
        h = layers.layer_norm(params["ffn_ln"], h)
    h = layers.linear(params["fc2"], h, dtype=dtype)
    if rng is not None and dropout_rate > 0.0:
        h = layers.dropout(h, dropout_rate, rng)
    return h


# ---------------------------------------------------------------------------
# Decoder layer
# ---------------------------------------------------------------------------

def init_decoder_layer(key, cfg: MagnetoConfig):
    ka, kf, kn1, kn2 = jax.random.split(key, 4)
    params = {
        "attn": init_self_attention(ka, cfg.embed_dim, cfg.heads,
                                    subln=cfg.subln, multiway=cfg.multiway),
        "attn_ln": init_multiway(cfg.multiway, kn1,
                                 lambda k_: layers.init_layer_norm(cfg.embed_dim)),
        # MoE replaces the dense FFN outright (it IS the expert structure, so
        # the multiway duplication applies to attention/LN only)
        "ffn": (init_moe_ffn(kf, cfg.embed_dim, cfg.ffn_dim, cfg.moe_experts,
                             subln=cfg.subln)
                if cfg.moe_experts > 0 else
                init_multiway(cfg.multiway, kf,
                              lambda k_: init_ffn(k_, cfg.embed_dim, cfg.ffn_dim,
                                                  subln=cfg.subln))),
        "final_ln": init_multiway(cfg.multiway, kn2,
                                  lambda k_: layers.init_layer_norm(cfg.embed_dim)),
    }
    if cfg.subln:
        params = _apply_magneto_gamma(params, init.magneto_gamma(cfg.layers))
    return params


def _apply_magneto_gamma(layer_params, gamma: float):
    """Multiply fc1/fc2/attention-out/attention-v weights by the Magneto gain
    (torchscale scales these after construction when subln=True)."""

    def scale_linear(p):
        return {**p, "w": p["w"] * gamma}

    def scale_maybe_multiway(p):
        if "A" in p and "B" in p:
            return {"A": scale_linear(p["A"]), "B": scale_linear(p["B"])}
        return scale_linear(p)

    def scale_ffn(p):
        if "A" in p and "B" in p:
            return {"A": scale_ffn(p["A"]), "B": scale_ffn(p["B"])}
        if "experts" in p:  # MoE: gamma applies to the stacked expert weights
            return {**p, "experts": {**p["experts"],
                                     "fc1": scale_linear(p["experts"]["fc1"]),
                                     "fc2": scale_linear(p["experts"]["fc2"])}}
        return {**p, "fc1": scale_linear(p["fc1"]), "fc2": scale_linear(p["fc2"])}

    out = dict(layer_params)
    attn = dict(out["attn"])
    attn["v"] = scale_maybe_multiway(attn["v"])
    attn["out"] = scale_maybe_multiway(attn["out"])
    out["attn"] = attn
    out["ffn"] = scale_ffn(out["ffn"])
    return out


def decoder_layer(params, x, cfg: MagnetoConfig, *,
                  split: Optional[int] = None,
                  segment_ids: Optional[jax.Array] = None,
                  rng: Optional[jax.Array] = None,
                  cache: Optional[Dict[str, jax.Array]] = None,
                  cache_index: Optional[jax.Array] = None,
                  prefill: bool = False,
                  shared_kv: Optional[Dict[str, jax.Array]] = None,
                  shared_on: Optional[jax.Array] = None,
                  pos_offset: Optional[jax.Array] = None,
                  xpos_center: Optional[jax.Array] = None,
                  interpret: bool = False):
    dtype = cfg.dtype
    rngs = list(jax.random.split(rng, 3)) if rng is not None else [None, None, None]

    residual = x
    h = multiway_apply(cfg.multiway, layers.layer_norm, params["attn_ln"], x, split)
    h, new_cache = self_attention(
        params["attn"], h, heads=cfg.heads, subln=cfg.subln,
        multiway=cfg.multiway, split=split, causal=True,
        xpos=cfg.xpos_rel_pos, xpos_scale_base=cfg.xpos_scale_base,
        use_flash=cfg.use_flash_attention,
        flash_block_q=cfg.flash_block_q, flash_block_kv=cfg.flash_block_kv,
        segment_ids=segment_ids, attn_dropout=cfg.attention_dropout,
        rng=rngs[0], cache=cache, cache_index=cache_index,
        prefill=prefill, shared_kv=shared_kv, shared_on=shared_on,
        pos_offset=pos_offset, kv_window=cfg.kv_window, kv_sink=cfg.kv_sink,
        decode_attn_kernel=cfg.decode_attn_kernel,
        xpos_center=xpos_center,
        dtype=dtype, interpret=interpret,
        sequence_axis=cfg.sequence_axis,
        sequence_schedule=cfg.sequence_schedule)
    if rngs[1] is not None and cfg.dropout > 0.0:
        h = layers.dropout(h, cfg.dropout, rngs[1])
    x = residual + h

    residual = x
    h = multiway_apply(cfg.multiway, layers.layer_norm, params["final_ln"], x, split)
    aux = jnp.zeros([], jnp.float32)
    if cfg.moe_experts > 0:
        h, aux = moe_ffn(params["ffn"], h, num_experts=cfg.moe_experts,
                         top_k=cfg.moe_top_k,
                         capacity_factor=cfg.moe_capacity_factor,
                         activation=cfg.activation,
                         activation_fp32=cfg.activation_fp32, dtype=dtype,
                         aux_weight=cfg.moe_aux_weight,
                         z_weight=cfg.moe_z_weight,
                         rng=rngs[2], dropout_rate=cfg.dropout,
                         # pads route nowhere; cached (inference) paths use
                         # no-drop buffers so routing is padding/group-size
                         # independent — a padded serving prefill matches an
                         # unpadded forward exactly (nn/moe.py)
                         valid=(segment_ids >= 0) if segment_ids is not None
                         else None,
                         no_drop=cache is not None)
    else:
        h = multiway_apply(
            cfg.multiway,
            lambda p, xx: ffn(p, xx, activation=cfg.activation,
                              dropout_rate=cfg.dropout,
                              activation_dropout=cfg.activation_dropout,
                              rng=rngs[2], dtype=dtype,
                              activation_fp32=cfg.activation_fp32),
            params["ffn"], h, split)
    x = residual + h
    return x, new_cache, aux


# ---------------------------------------------------------------------------
# Full decoder
# ---------------------------------------------------------------------------

def init_decoder(key, cfg: MagnetoConfig, *, with_embeddings: bool = True):
    """Full decoder param pytree. ``with_embeddings=False`` builds only the
    layer stack + final LN (for callers that own their embedding tables)."""
    keys = jax.random.split(key, 5)
    params: Dict[str, Any] = {}
    if with_embeddings:
        params["embed"] = layers.init_embedding(
            keys[0], cfg.vocab_size, cfg.embed_dim, padding_idx=cfg.padding_idx)
        params["pos"] = layers.init_positional_embedding(
            keys[1], cfg.max_positions, cfg.embed_dim, padding_idx=cfg.padding_idx)
        params["out_proj"] = {
            "w": init.magneto_output_projection(keys[2], (cfg.embed_dim, cfg.vocab_size))}

    layer_keys = jax.random.split(keys[3], cfg.layers)
    if cfg.scan_layers:
        params["layers"] = jax.vmap(lambda k: init_decoder_layer(k, cfg))(layer_keys)
    else:
        params["layers"] = [init_decoder_layer(k, cfg) for k in layer_keys]
    params["ln"] = init_multiway(cfg.multiway, keys[4],
                                 lambda k_: layers.init_layer_norm(cfg.embed_dim))
    return params


def embed_only(params, cfg: MagnetoConfig, tokens) -> jax.Array:
    """Position-free scaled token embedding (forward_embedding()[1] without
    computing and discarding the positional add — the splice callers only
    need this half)."""
    return cfg.embed_scale * layers.embedding(params["embed"], tokens,
                                              dtype=cfg.dtype)


def forward_embedding(params, cfg: MagnetoConfig, tokens=None, *,
                      token_embedding=None, offset=0,
                      rng: Optional[jax.Array] = None
                      ) -> Tuple[jax.Array, jax.Array]:
    """torchscale ``Decoder.forward_embedding`` semantics
    (SURVEY.md §3.1 EMBED/RE-EMBED steps):

    returns ``(x, embed)`` with ``embed = embed_scale * token_embedding`` (no
    positions) and ``x = embed + learned_positions`` (+ dropout when
    training). Passing ``token_embedding`` skips the table lookup — this is
    how the reference re-embeds its spliced image+text sequence, which
    re-applies embed_scale (the double-scale quirk, SURVEY.md §2.6.1);
    ``KosmosConfig.parity_double_scale`` controls whether we reproduce it.
    """
    dtype = cfg.dtype
    if token_embedding is None:
        token_embedding = layers.embedding(params["embed"], tokens, dtype=dtype)
    seq_len = token_embedding.shape[1]
    embed = cfg.embed_scale * token_embedding
    positions = layers.positional_embedding(
        params["pos"], seq_len, padding_idx=cfg.padding_idx, offset=offset,
        dtype=dtype)
    x = embed + positions
    if rng is not None and cfg.dropout > 0.0:
        x = layers.dropout(x, cfg.dropout, rng)
    return x, embed


def _extract_stacked_w8(tree):
    """Split stacked layer params into (scan_xs, slots): every stacked
    W8-quantized weight ``{"q": (L, K, N) int8, "scale": (L, 1, N)}`` is
    pulled out of the tree (replaced by None, a leafless pytree that scans
    through unchanged) and recorded in ``slots`` by its path."""
    slots = {}

    def rec(t, path):
        if isinstance(t, dict):
            if ("q" in t and "scale" in t
                    and getattr(t["q"], "ndim", 0) >= 3
                    and t["q"].dtype == jnp.int8):
                slots[path] = t
                return None
            return {k: rec(v, path + (k,)) for k, v in t.items()}
        if isinstance(t, (list, tuple)):
            return type(t)(rec(v, path + (i,)) for i, v in enumerate(t))
        return t

    return rec(tree, ()), slots


def _graft_stacked_w8(t, slots, li, path=()):
    """Re-insert the stacked W8 arrays plus the scan layer index where
    :func:`_extract_stacked_w8` removed them. nn/layers.linear recognizes the
    ``{"q", "scale", "layer"}`` marker and indexes inside the kernel."""
    if path in slots:
        s = slots[path]
        return {"q": s["q"], "scale": s["scale"], "layer": li}
    if isinstance(t, dict):
        return {k: _graft_stacked_w8(v, slots, li, path + (k,))
                for k, v in t.items()}
    if isinstance(t, (list, tuple)):
        return type(t)(_graft_stacked_w8(v, slots, li, path + (i,))
                       for i, v in enumerate(t))
    return t


def run_layers(params, x, cfg: MagnetoConfig, *,
               split: Optional[int] = None,
               segment_ids: Optional[jax.Array] = None,
               rng: Optional[jax.Array] = None,
               caches: Optional[Any] = None,
               cache_index: Optional[jax.Array] = None,
               prefill: bool = False,
               shared_caches: Optional[Any] = None,
               shared_on: Optional[jax.Array] = None,
               pos_offset: Optional[jax.Array] = None,
               xpos_center: Optional[jax.Array] = None,
               interpret: bool = False,
               with_aux: bool = False):
    """Run the layer stack + final LN. Returns (hidden, new_caches), or
    (hidden, new_caches, aux) when ``with_aux=True`` — ``aux`` is the summed
    fp32 MoE routing loss across layers (0 for dense models).

    ``shared_caches``: read-only per-layer prefix KV (same layout as
    ``caches`` at batch 1) attended by rows flagged in ``shared_on`` without
    per-row copies; ``pos_offset`` (B,) shifts xPos/positions by the shared
    length (see nn/attention.py shared-prefix serving)."""

    def one_layer(lp, xx, lrng, lcache, lshared=None):
        return decoder_layer(lp, xx, cfg, split=split, segment_ids=segment_ids,
                             rng=lrng, cache=lcache, cache_index=cache_index,
                             prefill=prefill, shared_kv=lshared,
                             shared_on=shared_on, pos_offset=pos_offset,
                             xpos_center=xpos_center, interpret=interpret)

    if cfg.remat:
        policies = {
            "nothing": jax.checkpoint_policies.nothing_saveable,
            "dots": jax.checkpoint_policies.dots_saveable,
            "dots_no_batch": jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        }
        if cfg.remat_policy not in policies:
            raise ValueError(f"unknown remat_policy {cfg.remat_policy!r}; "
                             f"choose from {sorted(policies)}")
        one_layer = jax.checkpoint(one_layer,
                                   policy=policies[cfg.remat_policy],
                                   static_argnums=(),
                                   prevent_cse=False)

    if cfg.scan_layers:
        # None subtrees are leafless pytrees, so they scan through unchanged —
        # one body covers all rng/cache combinations with a single trace.
        rngs = jax.random.split(rng, cfg.layers) if rng is not None else None

        # W8-quantized stacked weights stay OUT of the scan xs: a scanned
        # (L, K, N) int8 leaf would be dynamic-sliced into a fresh HBM copy
        # every layer step (pallas_call can't fuse the slice the way XLA's
        # own matmul does — measured 924 vs 1124 tok/s on flagship decode).
        # Instead the full array + the layer index are grafted back into the
        # layer's param tree and nn/layers.linear routes them through the
        # scalar-prefetch kernel (ops/quant_matmul.w8_matmul_stacked).
        scan_xs, w8_slots = _extract_stacked_w8(params["layers"])
        layer_ids = (jnp.arange(cfg.layers, dtype=jnp.int32) if w8_slots
                     else None)

        if caches is None:
            def body(xx, sc):
                lp, lrng, li = sc
                if w8_slots:
                    lp = _graft_stacked_w8(lp, w8_slots, li)
                y, _, laux = one_layer(lp, xx, lrng, None)
                return y, laux

            x, auxs = jax.lax.scan(body, x, (scan_xs, rngs, layer_ids))
            aux = auxs.sum()
            new_caches = None
        elif isinstance(caches, (list, tuple)):
            # Unrolled cached-decode steps (MagnetoConfig.decode_unroll):
            # the caller unstacked the cache into PER-LAYER list entries
            # (unstack_caches) so each layer's KV is its own buffer — the
            # in-place dynamic_update_slice then aliases through the token
            # scan's carry with no copies. Params stay stacked; the static
            # `a[li]` slices are loop-invariant and XLA hoists them. The
            # scan version below dynamic-slice-COPIES each layer's
            # (B, H, max_len, hd) cache out of the carry and back (~4x the
            # cache bytes/token: 566 vs 268 tok/s at 1024-prompt, 1221 vs
            # 912 at 128-prompt, on-chip — BASELINE.md decode-unroll
            # section). NOTE a stacked-cache unroll (static `.at[li]`
            # writebacks on the stacked array) was measured SLOWER than the
            # scan (225.9 tok/s) — separate buffers are the whole win.
            # Static per-layer W8 slices take the plain XLA dequant path
            # (best at decode, BASELINE.md W8 study).
            aux = jnp.zeros([], jnp.float32)
            new_caches = []
            for li in range(cfg.layers):
                lp = jax.tree_util.tree_map(lambda a: a[li],
                                            params["layers"])
                lshared = None
                if shared_caches is not None:
                    lshared = jax.tree_util.tree_map(
                        lambda c: c[li], shared_caches)
                x, ncache, laux = one_layer(
                    lp, x, rngs[li] if rngs is not None else None,
                    caches[li], lshared)
                aux = aux + laux
                new_caches.append(ncache)
        else:
            # Carry the stacked (layers, ...) cache and update each layer's
            # slice in place: threading it through scan xs->ys instead would
            # re-materialize the whole stacked cache every decode step
            # (several full copies per token — dominates decode time).
            def body(carry, sc):
                xx, cache_all = carry
                li, lp, lrng = sc
                if w8_slots:
                    lp = _graft_stacked_w8(lp, w8_slots, li)
                lcache = jax.tree_util.tree_map(
                    lambda c: jax.lax.dynamic_index_in_dim(c, li, 0,
                                                           keepdims=False),
                    cache_all)
                lshared = None
                if shared_caches is not None:
                    # read-only: closed over, not carried (never updated)
                    lshared = jax.tree_util.tree_map(
                        lambda c: jax.lax.dynamic_index_in_dim(
                            c, li, 0, keepdims=False), shared_caches)
                y, ncache, laux = one_layer(lp, xx, lrng, lcache, lshared)
                cache_all = jax.tree_util.tree_map(
                    lambda c, n: jax.lax.dynamic_update_index_in_dim(
                        c, n, li, 0),
                    cache_all, ncache)
                return (y, cache_all), laux

            (x, new_caches), auxs = jax.lax.scan(
                body, (x, caches),
                (jnp.arange(cfg.layers), scan_xs, rngs))
            aux = auxs.sum()
    else:
        new_caches = [] if caches is not None else None
        rngs = (jax.random.split(rng, cfg.layers) if rng is not None else
                [None] * cfg.layers)
        aux = jnp.zeros([], jnp.float32)
        for i, lp in enumerate(params["layers"]):
            lcache = caches[i] if caches is not None else None
            lshared = shared_caches[i] if shared_caches is not None else None
            x, ncache, laux = one_layer(lp, x, rngs[i], lcache, lshared)
            aux = aux + laux
            if caches is not None:
                new_caches.append(ncache)

    x = multiway_apply(cfg.multiway, layers.layer_norm, params["ln"], x, split)
    if with_aux:
        return x, new_caches, aux
    return x, new_caches


def output_logits(params, hidden, cfg: MagnetoConfig):
    return layers.linear(params["out_proj"], hidden, dtype=cfg.dtype)


def decoder_forward(params, tokens, cfg: MagnetoConfig, *,
                    segment_ids: Optional[jax.Array] = None,
                    rng: Optional[jax.Array] = None,
                    interpret: bool = False,
                    position_offset=0,
                    with_aux: bool = False):
    """tokens (B, L) -> logits (B, L, vocab). The KosmosLanguage path
    (/root/reference/kosmosx/model.py:310-320: single embed-scale + positions,
    then decode, then project).

    ``position_offset``: global position of tokens[:, 0] — used by sequence
    parallelism, where each shard embeds its slice at its global offset."""
    rngs = list(jax.random.split(rng, 2)) if rng is not None else [None, None]
    x, _ = forward_embedding(params, cfg, tokens, rng=rngs[0],
                             offset=position_offset)
    if with_aux:
        h, _, aux = run_layers(params, x, cfg, segment_ids=segment_ids,
                               rng=rngs[1], interpret=interpret, with_aux=True)
        return output_logits(params, h, cfg), aux
    h, _ = run_layers(params, x, cfg, segment_ids=segment_ids, rng=rngs[1],
                      interpret=interpret)
    return output_logits(params, h, cfg)


# ---------------------------------------------------------------------------
# KV cache helpers
# ---------------------------------------------------------------------------

def init_cache(cfg: MagnetoConfig, batch: int, max_len: int, dtype=None):
    """Zeroed per-layer KV caches. Stacked (layers, ...) when scan_layers.

    ``cfg.kv_cache_dtype == "int8"``: storage is per-position symmetric int8
    codes + fp32 scales (``{"k","k_scale","v","v_scale"}``) — halves decode
    cache-read bandwidth; nn/attention quantizes on write and fuses the
    dequant into the attention matmuls."""
    hd = cfg.head_dim
    shape = (batch, cfg.heads, max_len, hd)
    sshape = (batch, cfg.heads, max_len, 1)
    if cfg.kv_cache_dtype == "int8":
        def make(prefix_shape=()):
            return {"k": jnp.zeros(prefix_shape + shape, jnp.int8),
                    "k_scale": jnp.ones(prefix_shape + sshape, jnp.float32),
                    "v": jnp.zeros(prefix_shape + shape, jnp.int8),
                    "v_scale": jnp.ones(prefix_shape + sshape, jnp.float32)}
        if cfg.scan_layers:
            return make((cfg.layers,))
        return [make() for _ in range(cfg.layers)]
    dtype = dtype or cfg.dtype
    one = lambda: {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}
    if cfg.scan_layers:
        stacked = (cfg.layers,) + shape
        return {"k": jnp.zeros(stacked, dtype), "v": jnp.zeros(stacked, dtype)}
    return [one() for _ in range(cfg.layers)]


def wants_unrolled_decode(cfg: MagnetoConfig, caches) -> bool:
    """Should cached decode over this pool run the unrolled layer loop?

    True when the config opts in AND the pool is at least
    decode_unroll_min_len. On-chip the per-layer-buffer unroll beat the
    scan at EVERY pool length measured (1221 vs 912 tok/s at pool 320,
    962 vs 702 at 512, 566 vs 268 at 1216 — BASELINE.md decode-unroll
    section), so the model default is 0 (always); the serving engine
    gates separately (ServeConfig.unroll_min_len) because its dispatch
    boundary pays unstack/restack pool copies. Pool length is static (a
    cache shape), so this decides per compiled program."""
    if not (cfg.scan_layers and cfg.decode_unroll) or caches is None:
        return False
    first = caches[0] if isinstance(caches, (list, tuple)) else caches
    return first["k"].shape[-2] >= cfg.decode_unroll_min_len


def unstack_caches(caches, cfg: MagnetoConfig):
    """Stacked ``(layers, ...)`` cache tree -> per-layer list, one buffer
    per layer. This is what makes the unrolled decode loop fast: each
    layer's in-place KV update aliases through the token scan's carry
    instead of being dynamic-slice-copied out of one big array. The
    unstack itself copies the cache ONCE — do it outside the token scan."""
    if isinstance(caches, (list, tuple)):
        return list(caches)
    return [jax.tree_util.tree_map(lambda c: c[li], caches)
            for li in range(cfg.layers)]


def stack_caches(caches):
    """Inverse of unstack_caches (per-layer list -> stacked tree)."""
    if not isinstance(caches, (list, tuple)):
        return caches
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *caches)


def recenter_caches(caches, delta, cfg: MagnetoConfig):
    """Slide the xPos decay center of every cached KEY forward by ``delta``
    (scalar or (B,)) positions: multiplies stored keys by
    ``zeta**(delta/scale_base)`` per dim (nn/xpos.recenter_scale), after which
    queries/keys must be rotated with ``xpos_center = old_center + delta``.

    This is what makes rolling-window (``kv_window``) generation truly
    unbounded: with a fixed center 0 the per-dim decay ``zeta**(pos/sb)``
    over/underflows past ``xpos_position_bound()`` (~36k at scale_base 512);
    re-centering every few thousand steps keeps both query upscales and cached
    key downscales in a bounded range forever. The q·k product is unchanged in
    exact arithmetic (the center cancels); in bf16 each re-center costs one
    rounding of the cached keys, and for int8 KV caches one re-quantization
    (absmax/127 noise) — both negligible at the default interval.

    Values ("v") carry no xPos and are untouched."""
    from kosmosx_tpu.nn.xpos import recenter_scale

    factor = recenter_scale(cfg.head_dim, delta, cfg.xpos_scale_base)

    def rescale(cache):
        if "k_scale" in cache:  # int8 KV: dequant -> rescale -> requant
            from kosmosx_tpu.nn.attention import _quantize_kv
            k = cache["k"].astype(jnp.float32) * cache["k_scale"]
            kq, ks = _quantize_kv(k * factor)
            return {**cache, "k": kq, "k_scale": ks}
        return {**cache, "k": (cache["k"].astype(jnp.float32)
                               * factor).astype(cache["k"].dtype)}

    if isinstance(caches, list):
        return [rescale(c) for c in caches]
    # stacked (layers, B, H, L, hd): factor broadcasts from the right
    return rescale(caches)
