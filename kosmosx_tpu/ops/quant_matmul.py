"""Pallas TPU weight-only int8 matmul kernels (W8 inference).

Counterpart of the bitsandbytes int8 CUDA machinery the reference leans on
(bnb.nn.Embedding at /root/reference/kosmosx/model.py:161-163; 8-bit
optimizers commented at /root/reference/train.py:399-402). The kernels read
int8 weight tiles straight from HBM, dequantize them on the VPU once the
tile lands in VMEM, feed the MXU in the activation dtype with fp32
accumulation, and apply the per-output-channel scale once per output tile
(the per-channel scale commutes out of the contraction, so this is exact
algebra over the codes). The stacked variant takes a scalar-prefetch layer
index so a ``lax.scan`` over stacked (L, K, N) codes never materializes a
sliced copy.

Measured honestly on the flagship (v5e via the axon tunnel, decode batch 8,
128 new tokens): bf16 911 tok/s; W8 via XLA's own dequant-fused matmul
1124; W8 via these kernels 924 (naive: scan slice-copy) / 1081 (stacked,
1024^2 blocks). Microbenchmarks on the (8,2048)x(2048,8192) FFN shape show
every int8 path capping at 197-225 GB/s effective (XLA dequant 222, stacked
kernel 213, int8xint8 MXU 197) while bf16 streams at ~337 GB/s — and RAW
flat reads measure ~310 GB/s (int8/int32) vs ~345 GB/s (bf16), so at
decode's tiny M there is no recoverable bandwidth for a hand kernel.
nn/layers.linear therefore defaults these kernels OFF (set_w8_kernel) and
uses the XLA expression; the kernels stay available for explicit use and
for larger-M quantized matmuls where they tie XLA.

Off-TPU the public entry points fall back to the Pallas interpreter only
when asked (``interpret=True``); CPU meshes and multi-chip pjit paths use
the XLA expression via nn/layers.linear.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None


def _cdiv(a, b):
    return -(-a // b)


def _pad_axis(x, length, axis):
    pad = length - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _kernel(x_ref, q_ref, s_ref, o_ref, acc_ref, *, nk):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = q_ref[...].astype(x_ref.dtype)  # dequant on the VMEM tile (VPU)
    acc_ref[...] += lax.dot(x_ref[...], w,
                            preferred_element_type=jnp.float32)

    @pl.when(ki == nk - 1)
    def _store():
        o_ref[...] = (acc_ref[...] * s_ref[...]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "block_k", "block_n",
                                             "interpret"))
def _w8_matmul_2d(x, q, scale, *, block_m, block_k, block_n, interpret):
    """x: (M, K) float; q: (K, N) int8; scale: (1, N) fp32 → (M, N) x.dtype."""
    m, k = x.shape
    n = q.shape[1]
    mp = _cdiv(m, block_m) * block_m
    kp = _cdiv(k, block_k) * block_k
    np_ = _cdiv(n, block_n) * block_n
    xp = _pad_axis(_pad_axis(x, mp, 0), kp, 1)
    qp = _pad_axis(_pad_axis(q, kp, 0), np_, 1)
    sp = _pad_axis(scale.astype(jnp.float32), np_, 1)
    nm, nn, nk = mp // block_m, np_ // block_n, kp // block_k

    out = pl.pallas_call(
        functools.partial(_kernel, nk=nk),
        grid=(nm, nn, nk),
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda mi, ni, ki: (mi, ki)),
            pl.BlockSpec((block_k, block_n), lambda mi, ni, ki: (ki, ni)),
            pl.BlockSpec((1, block_n), lambda mi, ni, ki: (0, ni)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda mi, ni, ki: (mi, ni)),
        out_shape=jax.ShapeDtypeStruct((mp, np_), x.dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(xp, qp, sp)
    if mp != m or np_ != n:
        out = out[:m, :n]
    return out


def w8_matmul(x, q, scale, *, block_m: int = 256, block_k: int = 512,
              block_n: int = 512, interpret: bool = False):
    """``(x @ q) * scale`` with int8 ``q`` dequantized tile-wise in VMEM.

    - ``x``: (..., K) float (bf16/fp32); leading dims are flattened.
    - ``q``: (K, N) int8 codes (utils/quantize._quantize_w layout).
    - ``scale``: (1, N) or (N,) fp32 per-output-channel scale.

    Ragged M/K/N are zero-padded to block multiples (zero rows/cols
    contribute nothing to the contraction). Block sizes shrink to fit
    small operands while staying on the (sublane, lane) grid.
    """
    lead = x.shape[:-1]
    k = x.shape[-1]
    n = q.shape[1]
    xm = x.reshape(-1, k)
    m = xm.shape[0]
    scale = scale.reshape(1, n)
    # shrink blocks for small shapes; keep sublane/lane alignment
    bm = max(16, min(block_m, _cdiv(m, 16) * 16))
    bk = max(128, min(block_k, _cdiv(k, 128) * 128))
    bn = max(128, min(block_n, _cdiv(n, 128) * 128))
    out = _w8_matmul_2d(xm, q, scale, block_m=bm, block_k=bk, block_n=bn,
                        interpret=interpret)
    return out.reshape(*lead, n)


def w8_matmul_reference(x, q, scale):
    """Exact-math XLA fallback (same algebra, no kernel)."""
    y = x @ q.astype(x.dtype)
    return y * scale.reshape(1, -1).astype(x.dtype)


# ---------------------------------------------------------------------------
# Stacked-layer variant (scalar-prefetch layer index)
# ---------------------------------------------------------------------------
#
# Under ``lax.scan`` over a stacked (L, K, N) weight, the scan body sees a
# dynamically-sliced (K, N) operand. XLA can fuse that slice into its own
# matmul, but a pallas_call needs a materialized buffer — the slice becomes
# a full HBM copy of the layer's int8 codes every step, erasing the
# bandwidth win (measured: 924 tok/s vs 1124 for plain XLA on flagship
# decode). This variant instead takes the WHOLE stacked array plus the layer
# index as a scalar-prefetch operand: the BlockSpec index_map selects the
# layer's tiles directly, so the kernel DMAs exactly the tiles it needs and
# nothing is copied.

def _stacked_kernel(li_ref, x_ref, q_ref, s_ref, o_ref, acc_ref, *, nk):
    del li_ref  # consumed by the index maps
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = q_ref[0].astype(x_ref.dtype)
    acc_ref[...] += lax.dot(x_ref[...], w,
                            preferred_element_type=jnp.float32)

    @pl.when(ki == nk - 1)
    def _store():
        o_ref[...] = (acc_ref[...] * s_ref[0]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "block_k", "block_n",
                                             "interpret"))
def _w8_matmul_stacked_2d(x, q, scale, layer, *, block_m, block_k, block_n,
                          interpret):
    """x: (M, K); q: (L, K, N) int8; scale: (L, 1, N); layer: int32 scalar."""
    m, k = x.shape
    n = q.shape[2]
    mp = _cdiv(m, block_m) * block_m
    xp = _pad_axis(x, mp, 0)
    nm, nn, nk = mp // block_m, n // block_n, k // block_k

    # NOTE: with scalar prefetch, index_map receives the scalar ref(s)
    # AFTER the grid indices: (mi, ni, ki, li_ref).
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nm, nn, nk),
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda mi, ni, ki, li: (mi, ki)),
            pl.BlockSpec((1, block_k, block_n),
                         lambda mi, ni, ki, li: (li[0], ki, ni)),
            pl.BlockSpec((1, 1, block_n), lambda mi, ni, ki, li: (li[0], 0, ni)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n),
                               lambda mi, ni, ki, li: (mi, ni)),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(_stacked_kernel, nk=nk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((mp, n), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), xp, q, scale.astype(jnp.float32))
    return out[:m] if mp != m else out


def w8_matmul_stacked(x, q, scale, layer, *, block_m: int = 256,
                      block_k: int = 1024, block_n: int = 1024,
                      interpret: bool = False):
    """``(x @ q[layer]) * scale[layer]`` without materializing the slice.

    - ``x``: (..., K) float; ``q``: (L, K, N) int8; ``scale``: (L, 1, N);
    - ``layer``: traced int32 scalar (the scan induction variable).

    K and N must be multiples of 128 (true for every decoder matmul shape;
    padding a stacked weight would defeat the no-copy point — callers with
    ragged shapes should use :func:`w8_matmul` on a sliced weight instead).
    """
    lead = x.shape[:-1]
    k = x.shape[-1]
    l_, kq, n = q.shape
    if kq != k:
        raise ValueError(f"x K={k} vs q K={kq}")
    if k % 128 or n % 128:
        raise ValueError(f"stacked W8 matmul needs K,N % 128 == 0; got {k},{n}")
    xm = x.reshape(-1, k)
    m = xm.shape[0]
    bm = max(16, min(block_m, _cdiv(m, 16) * 16))
    bk = min(block_k, k)
    bn = min(block_n, n)
    while k % bk:
        bk //= 2
    while n % bn:
        bn //= 2
    out = _w8_matmul_stacked_2d(xm, q, scale.reshape(l_, 1, n), layer,
                                block_m=bm, block_k=bk, block_n=bn,
                                interpret=interpret)
    return out.reshape(*lead, n)
