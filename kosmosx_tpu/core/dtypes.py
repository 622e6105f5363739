"""Dtype policy helpers.

Policy: parameters live in fp32 pytrees; matmul inputs are cast to the config
compute dtype (bf16 on TPU); softmax / LayerNorm / residual-sensitive math run
in fp32. This replaces the reference's fp16 Accelerator + FSDP MixedPrecision
plumbing (/root/reference/train.py:148-171,494) — on TPU, bf16 needs no loss
scaling.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_tree(tree, dtype):
    """Cast every floating-point leaf of a pytree to ``dtype``."""

    def _cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(_cast, tree)


def init_casted(init_fn, key, dtype):
    """Run ``init_fn(key)`` and cast the result to ``dtype`` inside ONE jit.

    Materializing the full fp32 tree and then casting doubles peak HBM
    (the 2.9B-param flagship needs 10.7 GiB fp32 + 5.4 GiB bf16 > the
    16 GiB of a v5e chip). Fused under jit, XLA frees each fp32 leaf right
    after its cast, so peak is the bf16 tree + one fp32 leaf (~1.5 GiB).
    """
    return jax.jit(lambda k: cast_tree(init_fn(k), dtype))(key)


def cast(x, dtype):
    if dtype is None:
        return x
    return x.astype(dtype)


def promote_fp32(x):
    return x.astype(jnp.float32)
