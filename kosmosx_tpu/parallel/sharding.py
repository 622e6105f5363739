"""Sharding rules: param-tree paths -> PartitionSpec.

This is the declarative TPU replacement for the reference's imperative FSDP
wrapping (/root/reference/train.py:116-200) and DeepSpeed ZeRO-3 JSON
(config/zero3.json): instead of wrapping modules, we attach a NamedSharding to
every parameter leaf and let XLA GSPMD insert the all-gathers /
reduce-scatters over ICI (SURVEY.md §2.3).

Scheme (megatron-style for the decoder hot path):
- q/k/v and fc1 weights (in, out): out dim (heads / ffn) over ``tensor``,
  in dim over ``fsdp``;
- out-proj and fc2 weights: in dim over ``tensor``, out dim over ``fsdp``
  (the row-parallel halves — XLA inserts the psum);
- biases shard with their matmul's output dim; LayerNorms replicate;
- embedding / output-projection tables: vocab over ``fsdp``, model dim over
  ``tensor``;
- everything else 2D+: largest dim over ``fsdp`` (pure ZeRO);
- scan-stacked layer params get a leading ``None`` axis.

With ``fsdp=1, tensor=1`` every spec degenerates to full replication and the
mesh is pure data parallel.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _path_names(path) -> Tuple[str, ...]:
    names = []
    for p in path:
        if hasattr(p, "key"):
            names.append(str(p.key))
        elif hasattr(p, "idx"):
            names.append(int(p.idx))
        else:
            names.append(str(p))
    return tuple(names)


def _spec_for(names: Tuple, leaf) -> P:
    # multiway expert keys are transparent for rule matching: the parent of
    # attn/out/A/w is "out", not "A" (otherwise the row-parallel rules would
    # silently miss every multiway projection — the flagship default)
    strs = [n for n in names if isinstance(n, str) and n not in ("A", "B")]
    last = strs[-1] if strs else ""
    parent = strs[-2] if len(strs) >= 2 else ""
    nd = getattr(leaf, "ndim", 0)

    # MoE (nn/moe.py): expert-stacked leaves carry a leading E axis sharded
    # over the ``expert`` mesh axis; within an expert, fc1 is column-parallel
    # and fc2 row-parallel like the dense FFN rules below. The router stays
    # tiny: replicate its E dim.
    if "experts" in strs:
        if last == "w" and nd == 3:
            return P("expert", "tensor", "fsdp") if parent == "fc2" \
                else P("expert", "fsdp", "tensor")
        if nd == 2:  # biases (E,F)/(E,D), ffn_ln scale/bias (E,F)
            return P("expert", None) if parent == "fc2" \
                else P("expert", "tensor")
        return P()
    if parent == "router":
        return P("fsdp", None)

    # LoRA factors (train/lora.py): rank-sized, replicate — sharding a
    # (d, r<=64) matmul over the mesh costs more in collectives than it saves
    if "lora" in strs:
        return P()

    # embeddings: (vocab/positions, model_dim) — vocab over fsdp, model dim
    # over tensor (matches the out-projection orientation below)
    if last == "table":
        if "pos" in strs or "pos_embed" in strs or "media_pos_emb" in strs:
            return P()  # small tables: replicate
        return P("fsdp", "tensor")
    if last in ("class_embedding", "latents", "media_pos_emb"):
        return P()
    # LayerNorm params
    if last in ("scale", "bias") or "ln" in parent or parent.endswith("norm") \
            or parent.startswith("norm"):
        if parent == "ffn_ln":
            # ffn_ln normalizes the tensor-sharded ffn axis; keep aligned
            return P("tensor")
        return P()
    if last == "w" and nd == 2:
        # row-parallel halves: attention out-proj, ffn fc2 (XLA inserts the
        # psum); out_proj (embed_dim, vocab) puts model dim on tensor and
        # vocab on fsdp, mirroring the embedding table
        if parent in ("out", "fc2", "to_out", "out_proj"):
            return P("tensor", "fsdp")
        # everything else (q/k/v, fc1, to_q/to_kv, image_proj, patch_embed,
        # mlp, ...): column-parallel — in dim over fsdp, out dim over tensor
        return P("fsdp", "tensor")
    if last == "b" and nd == 1:
        if parent in ("out", "fc2", "to_out"):
            return P()  # output dim replicated after psum
        return P("tensor")
    if nd >= 2:
        # generic ZeRO: shard the largest dim over fsdp
        axis = int(np.argmax(leaf.shape))
        spec = [None] * nd
        spec[axis] = "fsdp"
        return P(*spec)
    return P()


def param_specs(params) -> Any:
    """Tree of PartitionSpec matching ``params``. Scan-stacked layer params
    (path contains 'layers' but no list index) get a leading None axis."""

    def rule(path, leaf):
        names = _path_names(path)
        strs = [n for n in names if isinstance(n, str)]
        has_list_idx = any(isinstance(n, int) for n in names)
        stacked = ("layers" in strs and not has_list_idx
                   and getattr(leaf, "ndim", 0) >= 1)
        base = _spec_for(names, leaf if not stacked else
                         jax.ShapeDtypeStruct(leaf.shape[1:], leaf.dtype))
        if stacked:
            return P(None, *base)
        return base

    return jax.tree_util.tree_map_with_path(rule, params)


def batch_spec(ndim: int = 2) -> P:
    """Batches shard over both data axes (ZeRO: every fsdp shard-holder is a
    data worker). Scalars replicate."""
    if ndim == 0:
        return P()
    return P(("data", "fsdp"), *([None] * (ndim - 1)))


def shard_params(params, mesh: Mesh, specs=None):
    specs = specs if specs is not None else param_specs(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)


def shard_batch(batch, mesh: Mesh, per_process: bool = False):
    """Place a host batch on the mesh.

    ``per_process=False`` (default): the host value is assumed IDENTICAL on
    every process and is placed as one global array (the convention of the
    two-process test, tests/dist_worker.py).

    ``per_process=True``: each process holds its OWN batch slice (e.g. a
    shard_stream'd loader) and contributes it as the local shard of a
    global array — the global batch is the concatenation across processes,
    so per-process streams really do train on disjoint data."""
    def put(x):
        spec = batch_spec(getattr(x, "ndim", 0))
        s = NamedSharding(mesh, spec)
        if per_process and jax.process_count() > 1 \
                and getattr(x, "ndim", 0) > 0:
            return jax.make_array_from_process_local_data(s, np.asarray(x))
        return jax.device_put(x, s)

    return jax.tree_util.tree_map(put, batch)
