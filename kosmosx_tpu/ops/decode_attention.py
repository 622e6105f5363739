"""Pallas TPU decode attention: single-query attention over a KV cache.

The KV-cache decode step (nn/attention.py, ``cache`` path at L=1) is the
serving engine's inner loop. XLA lowers its two einsums —
``bhqd,bhkd->bhqk`` and ``bhqk,bhkd->bhqd`` with a query length of ONE —
through the MXU at M=1 (1/128 of the systolic array's rows) plus layout
transposes of the cache operand, moving cache bytes at an effective
~26-65 GB/s against this chip's ~345 GB/s wall (BASELINE.md decode
S-sweep). This kernel is the bandwidth-shaped replacement:

- grid (B, S_blocks), S innermost; each grid point streams ALL H heads'
  (block_s, hd) K/V tiles for one batch row HBM->VMEM and reduces them on
  the VPU (broadcast-mul + lane reduction for scores, sublane reduction
  for the output) — no MXU M=1 waste, no layout transposes, and the grid
  is B*nS points (not B*H*nS: per-point overhead measured ~4 us dominates
  a finer grid — first-cut kernel ran 28 GB/s at S=512).
- ``kv_len`` rides as a scalar-prefetch operand: the BlockSpec index maps
  CLAMP the S index to the row's last valid block, so fully-invalid tail
  blocks re-point at an already-fetched tile and their DMA is skipped
  (Pallas elides copies when the block index is unchanged). A serving
  pool sized for max_len only ever reads each row's valid prefix.
- online softmax in the log2 domain (exp2, change of base on the reduced
  scores — same trick as ops/flash_attention.py).
- int8 KV cache variant: codes dequantize on VMEM tiles (column scales
  into scores, value scales into probabilities — the bf16 cache is never
  materialized, matching the einsum path's algebra, nn/attention.py:95-99).

The reference has no decode loop at all (its generation API is a stub,
SURVEY.md §1); this replaces the CUDA flash-decoding kernels a torch
serving stack would pull in.

Wired behind ``MagnetoConfig.decode_attn_kernel`` (default False until the
on-chip study lands; benchmarks/decode_attn_study.py measures it against
the einsum path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

try:  # pltpu imports on CPU too (interpret mode)
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

LOG2E = 1.4426950408889634
MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _cdiv(a, b):
    return -(-a // b)


def decode_attention_reference(q, k, v, kv_len, *, k_scale=None,
                               v_scale=None):
    """jnp oracle: q (B,H,1,hd); k/v (B,H,S,hd); kv_len (B,) valid counts.
    int8 k/v take (B,H,S,1) fp32 scales. fp32 softmax, output in q.dtype."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32))
    if k_scale is not None:
        s = s * jnp.swapaxes(k_scale, -1, -2)
    lk = k.shape[2]
    valid = jnp.arange(lk)[None, None, None, :] < kv_len[:, None, None, None]
    s = jnp.where(valid, s, MASK_VALUE)
    p = jax.nn.softmax(s, axis=-1)
    if v_scale is not None:
        p = p * jnp.swapaxes(v_scale, -1, -2)
    return jnp.einsum("bhqk,bhkd->bhqd", p,
                      v.astype(jnp.float32)).astype(q.dtype)


def _kernel(lens_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref,
            o_ref, m_scr, l_scr, acc_scr, *, block_s, num_s_blocks):
    bi = pl.program_id(0)
    si = pl.program_id(1)
    kv_len = lens_ref[bi]

    @pl.when(si == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    @pl.when(si * block_s < kv_len)
    def _run():
        q = q_ref[0]                                  # (H, 1, hd)
        k = k_ref[0]                                  # (H, block_s, hd)
        h, _, hd = q.shape
        # scores on the VPU: broadcast-mul + lane reduction with fp32
        # accumulation (M=1 per head on the MXU would waste 127/128 of the
        # array and force a kT layout). Mosaic-version constraints
        # discovered on chip (2026-08-20 toolchain): `q2d[:, None, :]` /
        # broadcast_in_dim into a MIDDLE (sublane) dim emit a
        # (H,hd)->(H,1,hd) tpu.reshape that fails "infer-vector-layout:
        # unsupported shape cast", and matvec-shaped dot_generals (empty
        # non-contracting dims on either side) trip an MLIR attr-parser
        # bug. Loading q STRAIGHT OFF a (1,H,1,hd) ref keeps the unit
        # sublane dim without any reshape, and the implicit numpy
        # broadcast in `k * q` compiles clean.
        s = jnp.sum(k * q, axis=2,
                    dtype=jnp.float32)                # (H, block_s) f32
        # exp->exp2 change of base on the reduced scores: one small VPU op
        # (folding LOG2E into a bf16 q would add a rounding step)
        s = s * LOG2E
        if ks_ref is not None:
            s = s * ks_ref[0]                         # (H, block_s) scales
        pos = si * block_s + lax.broadcasted_iota(
            jnp.int32, s.shape, 1)
        s = jnp.where(pos < kv_len, s, MASK_VALUE)

        m_prev = m_scr[...]                           # (H, 1)
        m_curr = jnp.max(s, axis=1, keepdims=True)    # (H, 1)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(s - m_next)                      # (H, block_s)
        l_scr[...] = alpha * l_scr[...] + jnp.sum(p, axis=1, keepdims=True)
        m_scr[...] = m_next

        if vs_ref is not None:
            p = p * vs_ref[0]
        v = v_ref[0]                                  # (H, block_s, hd)
        # p broadcasts into the LANE dim directly (a lane splat —
        # broadcast_in_dim(..., (0, 1)) emits no reshape, unlike the
        # middle-dim case above), then sublane-reduce
        pb = lax.broadcast_in_dim(p, (h, block_s, hd), (0, 1))
        o_curr = jnp.sum(pb * v.astype(jnp.float32), axis=1,
                         dtype=jnp.float32)           # (H, hd) sublane red.
        acc_scr[...] = acc_scr[...] * alpha + o_curr

    @pl.when(si == num_s_blocks - 1)
    def _store():
        l_fin = l_scr[...]                            # (H, 1)
        inv = jnp.where(l_fin == 0.0, 1.0, 1.0 / l_fin)
        # o rides as a 3-D (B, H, hd) block: a (H, hd) vector expands to
        # (1, H, hd) — a LEADING unit dim, which Mosaic's layout inference
        # supports. The natural 4-D (1, H, 1, hd) block needs a
        # 32x64 -> 1x32x1x64 shape cast (INNER unit dim) that fails real
        # compilation ("infer-vector-layout: unsupported shape cast") even
        # though interpret mode passes.
        o_ref[0] = (acc_scr[...] * inv).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("block_s", "interpret"))
def _decode_attention_4d(q, k, v, kv_len, k_scale, v_scale, *,
                         block_s, interpret):
    """q (B, H, 1, hd); k/v (B, H, S, hd); kv_len (B,); scales
    (B, H, S) fp32 | None — 3D so their (1, h, block_s) blocks tile VMEM as
    (h, block_s); a trailing length-1 lane dim would pad x128 (measured
    20 MB scoped OOM). One grid point handles all H heads of a batch row
    for one S block (rows share kv_len; a finer grid is overhead-bound)."""
    b, h, _, hd = q.shape
    s_len = k.shape[2]
    ns = s_len // block_s
    has_scale = k_scale is not None

    def kv_index_map(bi, si, lens):
        # clamp to the row's last VALID block: beyond it the index repeats
        # and Pallas skips the DMA (same-index revisit)
        last = (jnp.maximum(lens[bi], 1) - 1) // block_s
        return (bi, 0, jnp.minimum(si, last), 0)

    in_specs = [
        pl.BlockSpec((1, h, 1, hd), lambda bi, si, lens: (bi, 0, 0, 0)),
        pl.BlockSpec((1, h, block_s, hd), kv_index_map),
        pl.BlockSpec((1, h, block_s, hd), kv_index_map),
    ]
    args = [q, k, v]
    if has_scale:
        def scale_index_map(bi, si, lens):
            last = (jnp.maximum(lens[bi], 1) - 1) // block_s
            return (bi, 0, jnp.minimum(si, last))

        in_specs += [pl.BlockSpec((1, h, block_s), scale_index_map)] * 2
        args += [k_scale.astype(jnp.float32), v_scale.astype(jnp.float32)]

    def kernel(lens_ref, q_ref, k_ref, v_ref, *rest):
        if has_scale:
            ks_ref, vs_ref = rest[0], rest[1]
            rest = rest[2:]
        else:
            ks_ref = vs_ref = None
        o_ref, m_scr, l_scr, acc_scr = rest
        return _kernel(lens_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref,
                       o_ref, m_scr, l_scr, acc_scr, block_s=block_s,
                       num_s_blocks=ns)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, ns),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, h, hd),
                               lambda bi, si, lens: (bi, 0, 0)),
        scratch_shapes=[pltpu.VMEM((h, 1), jnp.float32),
                        pltpu.VMEM((h, 1), jnp.float32),
                        pltpu.VMEM((h, hd), jnp.float32)],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(jnp.asarray(kv_len, jnp.int32), *args)
    return out[:, :, None, :]


def decode_attention(q, k, v, kv_len, *, k_scale=None, v_scale=None,
                     block_s: int = 512, interpret: bool = False):
    """Single-query cached attention. q: (B, H, 1, hd) pre-scaled and
    pre-rotated (the decode path applies sm_scale and xPos before the cache,
    nn/attention.py:339-350); k/v: (B, H, S, hd) the cache (bf16, or int8
    codes with ``k_scale``/``v_scale`` (B, H, S, 1) fp32); kv_len: (B,)
    count of valid positions per row. Returns (B, H, 1, hd) in q.dtype.

    S must divide by ``block_s`` after the auto-shrink below; hd must be a
    multiple of 8 (the (8,128) VMEM tile rule on the sublane axis). VMEM
    bounds block_s * heads: the K+V tiles (double-buffered) must fit ~12 MB,
    so block_s auto-shrinks for very wide head counts.
    """
    b, h, lq, hd = q.shape
    if lq != 1:
        raise ValueError(f"decode_attention is single-query; got Lq={lq}")
    if hd % 8:
        # the (8,128) VMEM tile rule on the sublane axis: interpret mode
        # would pass but Mosaic compilation fails mid-serving on the chip
        raise ValueError(f"head_dim {hd} must be a multiple of 8")
    s_len = k.shape[2]
    bs = min(block_s, s_len)
    # VMEM: K+V double-buffered bf16 tiles (2*2*2 B/elem) plus the kernel's
    # f32 temporaries (k/v casts and broadcast products, ~3*4 B/elem of
    # Mosaic stack — a 512-block at 32 heads measured 16.05 MB, 48 KB over
    # the 16 MB scoped limit; bf16 S=512 auto-shrinks to 256 under this)
    while h * bs * hd * (2 * 2 * 2 + 3 * 4) > 14 * 1024 * 1024 and bs > 8:
        bs //= 2
    # largest multiple-of-8 divisor of s_len <= bs (NOT repeated halving:
    # s_len = 8*odd just above a power of two, e.g. 1040, would collapse
    # all the way to block 8 — ~64x more grid steps for nothing)
    bs -= bs % 8
    while bs > 8 and s_len % bs:
        bs -= 8
    if bs < 8 or s_len % bs:
        raise ValueError(f"cache length {s_len} is not a multiple of 8; "
                         f"pad the cache (the (8,128) VMEM tile rule)")
    ks3 = k_scale.reshape(b, h, s_len) if k_scale is not None else None
    vs3 = v_scale.reshape(b, h, s_len) if v_scale is not None else None
    out = _decode_attention_4d(q, k, v, kv_len, ks3, vs3,
                               block_s=bs, interpret=interpret)
    return out
