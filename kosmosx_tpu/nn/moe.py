"""Token-routed mixture-of-experts FFN with expert parallelism.

Beyond-parity capability (SURVEY.md §2.3 lists "Expert parallel / MoE" as a
parallelism strategy; the reference's only expert structure is the *static*
two-expert multiway split, /root/reference/kosmosx/model.py:181 via
torchscale ``multiway=True`` — there is no learned router and no expert
sharding anywhere upstream). This module adds the real thing, designed
TPU-first:

- **GShard-style dense dispatch** (einsum against one-hot combine tensors)
  instead of gather/scatter: the dispatch and combine become large batched
  matmuls that tile onto the MXU, and every shape is static under ``jit``
  (capacity-based routing — no dynamic shapes, no data-dependent control
  flow).
- **Expert-stacked parameters**: every expert weight is one array with a
  leading ``(E, ...)`` axis, sharded over the mesh's ``expert`` axis
  (parallel/sharding.py rules). XLA GSPMD propagates the sharding through
  the dispatch einsums and inserts the all-to-alls over ICI — the JAX
  replacement for torch-MoE's explicit NCCL all_to_all calls.
- **Static top-k greedy routing** with per-group capacity: tokens are
  grouped by batch row; within a group earlier (causally prior) tokens win
  slots. Overflow tokens are dropped — their FFN output is zero, so the
  residual connection passes them through unchanged (Switch semantics).

Losses: Switch load-balance loss (``E * Σ_e f_e · p_e``, =1 when balanced)
and router z-loss, returned combined as one fp32 scalar so the decoder can
thread it through ``lax.scan`` as a side output.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from kosmosx_tpu.core import initializers as init
from kosmosx_tpu.nn import layers


def init_moe_ffn(key, embed_dim: int, ffn_dim: int, num_experts: int, *,
                 subln: bool = True) -> Dict[str, Any]:
    """Router + E-stacked expert FFN parameters.

    The router weight stays fp32 (routing decisions are precision-sensitive;
    same discipline as LayerNorm params). Expert weights are per-expert
    xavier — independent draws, matching what E separate ``init_ffn`` calls
    would produce.
    """
    kr, k1, k2 = jax.random.split(key, 3)
    e_keys1 = jax.random.split(k1, num_experts)
    e_keys2 = jax.random.split(k2, num_experts)
    experts = {
        "fc1": {"w": jnp.stack([init.xavier_uniform(k, (embed_dim, ffn_dim))
                                for k in e_keys1]),
                "b": jnp.zeros((num_experts, ffn_dim))},
        "fc2": {"w": jnp.stack([init.xavier_uniform(k, (ffn_dim, embed_dim))
                                for k in e_keys2]),
                "b": jnp.zeros((num_experts, embed_dim))},
    }
    if subln:
        experts["ffn_ln"] = {
            "scale": jnp.ones((num_experts, ffn_dim)),
            "bias": jnp.zeros((num_experts, ffn_dim)),
        }
    return {
        "router": {"w": init.xavier_uniform(kr, (embed_dim, num_experts))},
        "experts": experts,
    }


def moe_capacity(tokens_per_group: int, num_experts: int, top_k: int,
                 capacity_factor: float) -> int:
    """Static per-group per-expert slot count."""
    return max(1, int(math.ceil(
        top_k * tokens_per_group / num_experts * capacity_factor)))


def _routing(probs: jax.Array, num_experts: int, top_k: int,
             capacity: int, valid: Optional[jax.Array] = None) -> jax.Array:
    """probs (G, T, E) -> combine (G, T, E, C) fp32.

    Greedy top-k without replacement; slot positions assigned in token order
    within each group (earlier tokens keep their slots on overflow, the
    GShard priority rule — causally sensible for decoders).

    ``valid`` (G, T): invalid (pad) tokens are routed NOWHERE — they get no
    gates and, critically, consume no expert capacity (otherwise padded
    batches steal slots from real tokens)."""
    combine = jnp.zeros(probs.shape[:2] + (num_experts, capacity),
                        dtype=jnp.float32)
    counts = jnp.zeros(probs.shape[:1] + (num_experts,), dtype=jnp.int32)
    p = probs
    for _ in range(top_k):
        idx = jnp.argmax(p, axis=-1)                        # (G, T)
        gate = jnp.take_along_axis(p, idx[..., None], axis=-1)[..., 0]
        oh = jax.nn.one_hot(idx, num_experts, dtype=jnp.int32)   # (G, T, E)
        if valid is not None:
            oh = oh * valid.astype(jnp.int32)[..., None]
        # slot index for each token inside its chosen expert's buffer
        pos = jnp.cumsum(oh, axis=1) - 1 + counts[:, None, :]    # (G, T, E)
        counts = counts + oh.sum(axis=1)
        slot = (oh * pos).sum(axis=-1)                      # (G, T)
        keep = (slot < capacity).astype(jnp.float32)
        combine = combine + (
            (gate.astype(jnp.float32) * keep)[..., None, None]
            * oh.astype(jnp.float32)[..., None]
            * jax.nn.one_hot(slot, capacity, dtype=jnp.float32)[..., None, :])
        p = p * (1.0 - oh.astype(p.dtype))
    return combine


def moe_ffn(params, x, *, num_experts: int, top_k: int = 2,
            capacity_factor: float = 1.25, activation: str = "gelu",
            activation_fp32: bool = True, dtype=None,
            aux_weight: float = 0.01, z_weight: float = 1e-3,
            rng: Optional[jax.Array] = None, dropout_rate: float = 0.0,
            valid: Optional[jax.Array] = None, no_drop: bool = False,
            ) -> Tuple[jax.Array, jax.Array]:
    """x (B, S, D) -> (y (B, S, D), aux fp32 scalar).

    ``aux`` is the weighted load-balance + router-z loss; add it to the
    training objective (0-weighting it detaches routing from the loss and
    experts collapse). Dropped (over-capacity) tokens produce y=0 — the
    caller's residual add passes them through.

    ``valid`` (B, S): pad positions route nowhere — no gates, no capacity
    consumed, excluded from the aux losses. ``no_drop=True`` sizes the
    expert buffers at T (every token always fits): the INFERENCE mode —
    routing becomes independent of group size and padding, so a padded
    serving prefill produces bit-identical outputs to an unpadded forward
    (training keeps capacity_factor drop semantics).
    """
    assert top_k <= num_experts, (top_k, num_experts)
    B, S, D = x.shape
    capacity = (S if no_drop
                else moe_capacity(S, num_experts, top_k, capacity_factor))

    # Router in fp32: softmax over experts is precision-critical.
    logits = jnp.einsum("gtd,de->gte", x.astype(jnp.float32),
                        params["router"]["w"].astype(jnp.float32))
    probs = jax.nn.softmax(logits, axis=-1)

    combine = _routing(probs, num_experts, top_k, capacity,
                       valid=valid)                           # (G,T,E,C)

    # Load-balance loss over the top-1 assignment (Switch): balanced -> 1.0.
    # Means run over VALID tokens only (pads would dilute both factors).
    top1 = jax.nn.one_hot(jnp.argmax(probs, axis=-1), num_experts,
                          dtype=jnp.float32)
    if valid is not None:
        w = valid.astype(jnp.float32).reshape(-1, 1)
        denom = jnp.maximum(w.sum(), 1.0)
        f = (top1.reshape(-1, num_experts) * w).sum(axis=0) / denom
        p_mean = (probs.reshape(-1, num_experts) * w).sum(axis=0) / denom
        z_all = jax.nn.logsumexp(logits, axis=-1).reshape(-1) ** 2
        z_loss = (z_all * w[:, 0]).sum() / denom
    else:
        f = top1.reshape(-1, num_experts).mean(axis=0)
        p_mean = probs.reshape(-1, num_experts).mean(axis=0)
        z_loss = jnp.mean(jax.nn.logsumexp(logits, axis=-1) ** 2)
    lb_loss = num_experts * jnp.sum(f * p_mean)
    aux = (aux_weight * lb_loss + z_weight * z_loss).astype(jnp.float32)

    cdt = dtype or x.dtype
    dispatch = (combine > 0).astype(cdt)
    # (G,T,D) x (G,T,E,C) -> (E,G,C,D): one big MXU contraction; with fc1/fc2
    # sharded (expert, ...) GSPMD shards the E axis here and the all-to-all
    # rides ICI.
    xin = jnp.einsum("gtd,gtec->egcd", x.astype(cdt), dispatch)

    ex = params["experts"]
    h = jnp.einsum("egcd,edf->egcf", xin, ex["fc1"]["w"].astype(cdt))
    h = h + ex["fc1"]["b"].astype(cdt)[:, None, None, :]
    act = layers.activation_fn(activation)
    if activation_fp32:  # torchscale discipline (activation_fn(x.float()))
        h = act(h.astype(jnp.float32)).astype(h.dtype)
    else:
        h = act(h)
    if "ffn_ln" in ex:   # sub-LN between activation and fc2, per expert
        mean = h.mean(axis=-1, keepdims=True)
        var = ((h - mean) ** 2).mean(axis=-1, keepdims=True)
        hn = (h - mean) * jax.lax.rsqrt(var + 1e-5)
        h = (hn * ex["ffn_ln"]["scale"].astype(h.dtype)[:, None, None, :]
             + ex["ffn_ln"]["bias"].astype(h.dtype)[:, None, None, :])
    out = jnp.einsum("egcf,efd->egcd", h, ex["fc2"]["w"].astype(cdt))
    out = out + ex["fc2"]["b"].astype(cdt)[:, None, None, :]

    y = jnp.einsum("egcd,gtec->gtd", out, combine.astype(cdt))
    if rng is not None and dropout_rate > 0.0:
        y = layers.dropout(y, dropout_rate, rng)
    return y.astype(x.dtype), aux


def moe_ffn_dense_oracle(params, x, *, num_experts: int, top_k: int = 2,
                         activation: str = "gelu",
                         activation_fp32: bool = True) -> jax.Array:
    """Reference semantics with UNLIMITED capacity: every token runs through
    each of its top-k experts densely; outputs mixed by the router gates.
    Test oracle only (O(E) full FFN passes)."""
    B, S, D = x.shape
    logits = jnp.einsum("gtd,de->gte", x.astype(jnp.float32),
                        params["router"]["w"].astype(jnp.float32))
    probs = jax.nn.softmax(logits, axis=-1)
    gates = jnp.zeros_like(probs)
    p = probs
    for _ in range(top_k):
        idx = jnp.argmax(p, axis=-1)
        oh = jax.nn.one_hot(idx, num_experts, dtype=probs.dtype)
        gates = gates + oh * p
        p = p * (1.0 - oh)

    ex = params["experts"]
    act = layers.activation_fn(activation)
    y = jnp.zeros(x.shape, jnp.float32)
    for e in range(num_experts):
        h = x @ ex["fc1"]["w"][e] + ex["fc1"]["b"][e]
        h = act(h.astype(jnp.float32)).astype(h.dtype) if activation_fp32 \
            else act(h)
        if "ffn_ln" in ex:
            mean = h.mean(-1, keepdims=True)
            var = ((h - mean) ** 2).mean(-1, keepdims=True)
            h = ((h - mean) * jax.lax.rsqrt(var + 1e-5)
                 * ex["ffn_ln"]["scale"][e] + ex["ffn_ln"]["bias"][e])
        out = h @ ex["fc2"]["w"][e] + ex["fc2"]["b"][e]
        y = y + gates[..., e:e + 1].astype(jnp.float32) * out.astype(jnp.float32)
    return y.astype(x.dtype)
