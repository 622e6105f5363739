"""Functional NN primitives over explicit param pytrees.

Every module here is a pair of pure functions:
  ``init_*(key, ...) -> params``   (fp32 param pytree)
  ``*(params, x, ...) -> y``       (pure apply; casts to compute dtype itself)

This is the TPU-native replacement for torch nn.Module state: param pytrees
jit/pjit/shard cleanly, and sharding rules attach by tree path
(kosmosx_tpu/parallel/sharding.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from kosmosx_tpu.core import initializers as init


# ---------------------------------------------------------------------------
# Linear
# ---------------------------------------------------------------------------

def init_linear(key, in_dim: int, out_dim: int, *, bias: bool = True,
                w_init=init.xavier_uniform, gain: float = 1.0):
    params = {"w": w_init(key, (in_dim, out_dim), gain) if w_init is init.xavier_uniform
              else w_init(key, (in_dim, out_dim))}
    if bias:
        params["b"] = init.zeros((out_dim,))
    return params


# W8 matmul-kernel switch. Measured on the flagship (v5e, decode batch 8):
# XLA's own dequant-fused matmul 1124 tok/s vs the Pallas kernels 924
# (naive, scan slice-copies the codes) / 1081 (scalar-prefetch stacked,
# 1024^2 blocks). At decode's tiny M the XLA path wins — int8 streams cap
# at ~210-225 GB/s effective on this stack either way (raw flat int8 reads
# measure ~310 GB/s vs ~345 for bf16), so the hand kernel has no bandwidth
# left to recover. Default is therefore "off" (exact-math XLA expression);
# "on"/"auto" keep the kernels available for explicit use and larger-M
# quantized matmuls where they tie XLA.
_W8_KERNEL_MODE = "off"


def set_w8_kernel(mode: str) -> None:
    """mode: "auto" | "on" | "off"."""
    global _W8_KERNEL_MODE
    if mode not in ("auto", "on", "off"):
        raise ValueError(f"bad w8 kernel mode: {mode!r}")
    _W8_KERNEL_MODE = mode


def _use_w8_kernel() -> bool:
    if _W8_KERNEL_MODE == "on":
        return True
    if _W8_KERNEL_MODE == "off":
        return False
    return jax.default_backend() == "tpu"


def dense_weight(w, dtype=None):
    """Return a dense weight from either a raw array or a W8-quantized
    ``{"q", "scale"}`` dict (for consumers that need the full tensor, e.g.
    convolutions)."""
    if isinstance(w, dict) and "q" in w:
        w = w["q"].astype(dtype or jnp.float32) * w["scale"].astype(
            dtype or jnp.float32)
        return w
    return w.astype(dtype) if dtype is not None else w


def linear(params, x, *, dtype=None):
    """y = x @ w (+ b). Weights stored (in, out): a single MXU-friendly matmul.

    Weight-only int8: when ``params["w"]`` is ``{"q": int8 (in, out),
    "scale": (1, out)}`` (see utils/quantize_w8), the int8 codes are read
    from HBM (half the bytes — decode is weight-read bound) and converted
    on the fly; the per-output-channel scale commutes out of the
    contraction, so ``(x @ q) * scale`` is exact algebra.

    LoRA: when ``params["lora"] = {"a": (in, r), "b": (r, out), "scale"}``
    is present (train/lora.py), ``scale * (x @ a) @ b`` is added — two thin
    matmuls XLA fuses into the epilogue; composes with W8 bases (QLoRA)."""
    w = params["w"]
    if dtype is not None:
        x = x.astype(dtype)
    if isinstance(w, dict) and "q" in w:
        if "layer" in w:
            # stacked (L, K, N) codes + scan layer index (nn/decoder.py pulls
            # W8 leaves out of the scan xs so the slice is never materialized)
            if _use_w8_kernel():
                from kosmosx_tpu.ops.quant_matmul import w8_matmul_stacked
                y = w8_matmul_stacked(x, w["q"], w["scale"], w["layer"])
            else:
                q = jax.lax.dynamic_index_in_dim(w["q"], w["layer"], 0,
                                                 keepdims=False)
                s = jax.lax.dynamic_index_in_dim(w["scale"], w["layer"], 0,
                                                 keepdims=False)
                y = (x @ q.astype(x.dtype)) * s.astype(x.dtype)
        elif _use_w8_kernel():
            from kosmosx_tpu.ops.quant_matmul import w8_matmul
            y = w8_matmul(x, w["q"], w["scale"])
        else:
            q = w["q"].astype(x.dtype)
            y = (x @ q) * w["scale"].astype(q.dtype)
    else:
        if dtype is not None:
            w = w.astype(dtype)
        y = x @ w
    if "lora" in params:
        l = params["lora"]
        a = l["a"].astype(x.dtype)
        bl = l["b"].astype(x.dtype)
        scale = l["scale"].astype(x.dtype)
        if a.ndim == 3 and x.ndim == 3:
            # per-ROW adapters (multi-LoRA serving, serve/engine.py): every
            # batch row has its own factors a (B, in, r), b (B, r, out),
            # scale (B,) — two thin batched einsums
            d = jnp.einsum("bli,bir->blr", x, a)
            d = jnp.einsum("blr,bro->blo", d, bl)
            y = y + d * scale[:, None, None]
        else:
            y = y + ((x @ a) @ bl) * scale
    if "b" in params:
        b = params["b"]
        if dtype is not None:
            b = b.astype(dtype)
        y = y + b
    return y


# ---------------------------------------------------------------------------
# LayerNorm (fp32 math regardless of compute dtype)
# ---------------------------------------------------------------------------

def init_layer_norm(dim: int, *, bias: bool = True):
    params = {"scale": init.ones((dim,))}
    if bias:
        params["bias"] = init.zeros((dim,))
    return params


def layer_norm(params, x, *, eps: float = 1e-5):
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * params["scale"].astype(jnp.float32)
    if "bias" in params:
        y = y + params["bias"].astype(jnp.float32)
    return y.astype(orig_dtype)


# ---------------------------------------------------------------------------
# Embedding
# ---------------------------------------------------------------------------

def init_embedding(key, num_embeddings: int, dim: int, *, padding_idx: Optional[int] = None,
                   w_init=init.embedding_init):
    table = w_init(key, (num_embeddings, dim))
    if padding_idx is not None:
        table = table.at[padding_idx].set(0.0)
    return {"table": table}


def embedding(params, ids, *, dtype=None):
    """Plain gather. Replaces the reference's bitsandbytes 8-bit CUDA embedding
    (/root/reference/kosmosx/model.py:161-163); in fp32/bf16 math they agree.

    Weight-only int8 (the actual bnb 8-bit embedding equivalent): a table of
    ``{"q": int8 (V, D), "scale": (V, 1)}`` gathers int8 rows and rescales."""
    table = params["table"]
    if isinstance(table, dict) and "q" in table:
        rows = jnp.take(table["q"], ids, axis=0).astype(dtype or jnp.float32)
        scales = jnp.take(table["scale"], ids, axis=0).astype(rows.dtype)
        return rows * scales
    if dtype is not None:
        table = table.astype(dtype)
    return jnp.take(table, ids, axis=0)


# ---------------------------------------------------------------------------
# Learned positional embedding, fairseq/torchscale convention
# ---------------------------------------------------------------------------

def init_positional_embedding(key, max_positions: int, dim: int, *, padding_idx: int = 1):
    return init_embedding(key, max_positions, dim, padding_idx=padding_idx)


def positional_embedding(params, seq_len: int, *, padding_idx: int = 1, offset=0, dtype=None):
    """Positions are ``padding_idx + 1 + arange(L)`` (torchscale
    PositionalEmbedding semantics for unpadded input; the reference constructs
    it at /root/reference/kosmosx/model.py:164). ``offset`` supports
    incremental decoding (the cache length so far).
    """
    table = params["table"]
    rows = (table["q"] if isinstance(table, dict) else table).shape[0]
    if isinstance(offset, int):
        last = padding_idx + 1 + offset + seq_len - 1
        if last >= rows:
            # the reference silently indexes out of range past ~2046 tokens
            # (SURVEY.md §2.6.3) and JAX would fill NaN; fail loudly instead
            raise ValueError(
                f"sequence length {seq_len} (+offset {offset}) needs position "
                f"index {last} but the learned table has {rows} rows (usable "
                f"length = rows - padding_idx - 1 = {rows - padding_idx - 1}); "
                f"raise max_positions")
    positions = padding_idx + 1 + offset + jnp.arange(seq_len, dtype=jnp.int32)
    return embedding(params, positions, dtype=dtype)


# ---------------------------------------------------------------------------
# Activations (fp32 discipline like torchscale FeedForward: act in fp32)
# ---------------------------------------------------------------------------

def activation_fn(name: str):
    if name == "gelu":
        # torch.nn.functional.gelu default = exact erf gelu
        return lambda x: jax.nn.gelu(x, approximate=False)
    if name == "gelu_tanh":
        return lambda x: jax.nn.gelu(x, approximate=True)
    if name == "gelu_fast":
        # exact-erf gelu via purpose-fit piecewise polynomial: fp32-libm
        # accuracy (<7e-7 abs over the bf16 domain) at a fraction of XLA's
        # erf cost — see ops/fast_gelu.py
        from kosmosx_tpu.ops.fast_gelu import gelu_fast
        return gelu_fast
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    if name == "relu":
        return jax.nn.relu
    if name == "silu" or name == "swish":
        return jax.nn.silu
    raise ValueError(f"unknown activation: {name}")


# ---------------------------------------------------------------------------
# Dropout (explicit rng; identity when rng is None or rate == 0)
# ---------------------------------------------------------------------------

def dropout(x, rate: float, rng: Optional[jax.Array]):
    if rng is None or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, p=keep, shape=x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))
