"""Pallas TPU flash attention (forward + custom-VJP backward).

This is the framework's replacement for the CUDA flash-attention kernels the
reference pulls in through its dependency stack (zeta ``flash_attn=True`` at
/root/reference/tests/test_attention.py:14-15; commented ``flash_attention=True``
at /root/reference/experimental/model/kosmos.py:94). The decoder's hot loop
(24 x self-attention at up to 8k tokens, /root/reference/kosmosx/model.py:186-191)
runs through here.

Design (TPU-first):
- grid (batch, heads, q_blocks, kv_blocks); kv innermost ("arbitrary" — the
  online-softmax reduction); batch/heads/q "parallel" (megacore-dividable).
- scores/stats in fp32 VMEM scratch; inputs may be bf16; matmuls use
  ``preferred_element_type=float32`` so the MXU accumulates in fp32.
- causal block-skipping: KV tiles fully above the diagonal are skipped, and
  their DMA is redirected to the next useful tile (index-map trick).
- segment ids give padding/document masking (pad wrappers synthesize them for
  ragged lengths), composable with causal masking.
- row-statistics layout: per-q-row vectors (l, m, di, q segment ids) are
  stored as (..., L, 8) and kv segment ids as (B, 8, L). Both satisfy the
  TPU (8, 128) tiling rule with no in-kernel transposes and use 16x less HBM
  than the (..., L, 128) layout of the stock jax kernel.
- backward = two kernels (dKV iterates q-tiles per kv-tile; dQ iterates
  kv-tiles per q-tile) from saved (o, l, m) residuals — the standard
  flash-attention-2 decomposition.

Off-TPU (or with ``interpret=True``) the same kernels run in the Pallas
interpreter, so tests are CPU-runnable.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

try:  # pltpu is importable on CPU too (for interpret mode)
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
NUM_LANES = 128
NUM_SUBLANES = 8
# The online softmax runs in the log2 domain: exp(x) costs a hidden
# x*log2(e) multiply before the VPU's native pow2, so we fold
# sm_scale*log2(e) into q (or, fused-xPos, into the q sin/cos tables — free)
# and use exp2 directly. Saves one full (block_q, block_kv) VPU pass per
# tile on the softmax-bound forward. The saved m residual is therefore in
# log2 units; the backward recompute uses the same domain.
LOG2E = 1.4426950408889634


def _cdiv(a, b):
    return -(-a // b)


# ---------------------------------------------------------------------------
# Reference implementation (jnp) — oracle for tests and CPU fallback
# ---------------------------------------------------------------------------

def mha_reference(q, k, v, *, causal=True, sm_scale=1.0,
                  q_segment_ids=None, kv_segment_ids=None,
                  mask_value=DEFAULT_MASK_VALUE):
    """Plain-jnp attention. q: (B, H, Lq, D); k/v: (B, H, Lk, D);
    segment ids: (B, Lq)/(B, Lk) int32 (equal ids attend). When Lq != Lk the
    causal mask is bottom-right aligned (query i is absolute pos Lk-Lq+i)."""
    lq, lk = q.shape[-2], k.shape[-2]
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32))
    if sm_scale != 1.0:
        s = s * sm_scale
    mask = None
    if causal:
        qi = jnp.arange(lq)[:, None] + (lk - lq)
        kj = jnp.arange(lk)[None, :]
        mask = (kj <= qi)[None, None]
    if q_segment_ids is not None:
        seg = q_segment_ids[:, None, :, None] == kv_segment_ids[:, None, None, :]
        mask = seg if mask is None else mask & seg
    if mask is not None:
        s = jnp.where(mask, s, mask_value)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    p = p / jnp.where(l == 0.0, 1.0, l)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32)).astype(q.dtype)


def _block_below_or_on_diag(qi, block_q, ki, block_kv):
    """True if the (qi, ki) tile intersects or is below the causal diagonal."""
    return (qi + 1) * block_q - 1 >= ki * block_kv


# ---------------------------------------------------------------------------
# Fused xPos support
# ---------------------------------------------------------------------------
#
# xPos (torchscale XPOS; see nn/xpos.py) rotates q/k per position and applies
# a reciprocal decay (queries upscaled, keys downscaled). Applied outside the
# kernel it costs two full fp32 elementwise passes over (B, H, L, hd) per
# layer — pure HBM traffic. Fused, the rotation happens on tiles already in
# VMEM: sin/cos/decay tables (L, hd) are precomputed ONCE per call (tiny),
# and rotate-every-two is expressed as a matmul with a constant antisymmetric
# permutation matrix R (hd x hd) — MXU-friendly, no strided lane ops.
#
#   xpos(x) = x * cos_t + (x @ R) * sin_t          (tables include the decay)
#   d/dx    = g * cos_t - (g * sin_t) @ R          (R^T = -R)

def _rot_matrix(hd: int):
    """R with R[2m+1, 2m] = -1, R[2m, 2m+1] = +1: x @ R == rotate_every_two(x)."""
    i = lax.broadcasted_iota(jnp.int32, (hd, hd), 0)
    j = lax.broadcasted_iota(jnp.int32, (hd, hd), 1)
    minus = (i == j + 1) & (j % 2 == 0)
    plus = (j == i + 1) & (i % 2 == 0)
    return jnp.where(minus, -1.0, jnp.where(plus, 1.0, 0.0)).astype(jnp.float32)


def _xpos_tables(lq: int, lk: int, hd: int, scale_base: float, center: int):
    """(q_sin, q_cos, k_sin, k_cos), each (L, hd) fp32 with the xPos decay
    baked in (q tables carry zeta**power, k tables zeta**-power)."""
    from kosmosx_tpu.nn.xpos import xpos_sin_cos_scale  # lazy: avoid pkg cycle

    def tables(length):
        sin, cos, scale = xpos_sin_cos_scale(length, hd, offset=0,
                                             scale_base=int(scale_base),
                                             center=center)
        qs = jnp.repeat(sin * scale, 2, axis=-1)
        qc = jnp.repeat(cos * scale, 2, axis=-1)
        ks = jnp.repeat(sin / scale, 2, axis=-1)
        kc = jnp.repeat(cos / scale, 2, axis=-1)
        return qs, qc, ks, kc

    q_sin, q_cos, _, _ = tables(lq)
    _, _, k_sin, k_cos = tables(lk)
    return q_sin, q_cos, k_sin, k_cos


def _apply_rot(x, sin_t, cos_t, rot):
    """x (block, hd) any float dtype; tables fp32. Returns x's dtype."""
    x32 = x.astype(jnp.float32)
    y = x32 * cos_t + lax.dot(x32, rot,
                              preferred_element_type=jnp.float32) * sin_t
    return y.astype(x.dtype)


def _apply_rot_transpose(g, sin_t, cos_t, rot):
    """VJP of _apply_rot w.r.t. x: g * cos - (g * sin) @ R (fp32 in/out)."""
    return g * cos_t - lax.dot(g * sin_t, rot,
                               preferred_element_type=jnp.float32)


def _tile_mask(causal, qi, ki, qseg, kseg, block_q, block_kv):
    """Combined causal+segment boolean mask for one (block_q, block_kv) tile,
    or None. qseg: (block_q, 1) | None; kseg: (1, block_kv) | None."""
    mask = None
    if causal:
        rows = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 0) + qi * block_q
        cols = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 1) + ki * block_kv
        mask = cols <= rows
    if qseg is not None:
        seg = qseg == kseg
        mask = seg if mask is None else mask & seg
    return mask


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(q_ref, k_ref, v_ref, qseg_ref, kseg_ref,
                qsin_ref, qcos_ref, ksin_ref, kcos_ref,
                o_ref, l_ref, m_ref,
                m_scr, l_scr, acc_scr,
                *, causal, sm_scale, mask_value, num_kv_blocks, block_q, block_kv):
    qi = pl.program_id(2)
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    should_run = _block_below_or_on_diag(qi, block_q, ki, block_kv) if causal else True

    @pl.when(should_run)
    def _run():
        q = q_ref[0, 0]  # (block_q, d)
        k = k_ref[0, 0]  # (block_kv, d)
        if qsin_ref is not None:  # fused xPos on VMEM tiles (sm_scale*log2e
            rot = _rot_matrix(q.shape[-1])  # pre-folded into the q tables)
            q = _apply_rot(q, qsin_ref[...], qcos_ref[...], rot)
            k = _apply_rot(k, ksin_ref[...], kcos_ref[...], rot)
        s = lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
        if qsin_ref is None:
            # un-fused path: change of base on the fp32 scores (folding into
            # a bf16 q would add a rounding step); exp2 below still saves
            # exp's hidden multiply, so this is net-neutral VPU work
            s = s * (sm_scale * LOG2E)

        qseg = qseg_ref[0][:, :1] if qseg_ref is not None else None  # (block_q, 1)
        kseg = kseg_ref[0][:1, :] if kseg_ref is not None else None  # (1, block_kv)
        mask = _tile_mask(causal, qi, ki, qseg, kseg, block_q, block_kv)
        if mask is not None:
            s = jnp.where(mask, s, mask_value)

        m_prev = m_scr[...]                    # (block_q, NUM_LANES)
        l_prev = l_scr[...]
        m_curr = jnp.max(s, axis=1)[:, None]   # (block_q, 1)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(s - m_next[:, :1])
        l_curr = jnp.sum(p, axis=1)[:, None]
        m_scr[...] = m_next
        l_scr[...] = alpha * l_prev + l_curr

        v = v_ref[0, 0]
        o_curr = lax.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        acc_scr[...] = acc_scr[...] * alpha[:, :1] + o_curr

    @pl.when(ki == num_kv_blocks - 1)
    def _store():
        l_fin = l_scr[:, :1]
        inv = jnp.where(l_fin == 0.0, 1.0, 1.0 / l_fin)
        o_ref[0, 0] = (acc_scr[...] * inv).astype(o_ref.dtype)
        l_ref[0, 0] = jnp.broadcast_to(l_fin, (block_q, NUM_SUBLANES))
        m_ref[0, 0] = jnp.broadcast_to(m_scr[:, :1], (block_q, NUM_SUBLANES))


def _fwd(q, k, v, q_segment_ids, kv_segment_ids, xpos_tables, *, causal,
         sm_scale, block_q, block_kv, mask_value, interpret):
    """q: (B, H, Lq, D); k/v: (B, H, Lk, D); q_seg: (B, Lq, 8) | None;
    kv_seg: (B, 8, Lk) | None; xpos_tables: (q_sin, q_cos, k_sin, k_cos)
    each (L, D) fp32 | None. Returns (o, l, m) with l/m: (B, H, Lq, 8)."""
    b, h, lq, d = q.shape
    lk = k.shape[2]
    nq = lq // block_q
    nk = lk // block_kv
    has_seg = q_segment_ids is not None
    has_xpos = xpos_tables is not None
    if has_xpos:
        # fold sm_scale and the exp->exp2 change of base into the q-side
        # rotation tables — zero extra work inside the kernel
        c = sm_scale * LOG2E
        q_sin, q_cos, k_sin, k_cos = xpos_tables
        xpos_tables = (q_sin * c, q_cos * c, k_sin, k_cos)

    def kv_index_map(bi, hi, qi, ki):
        if causal:
            # if this tile is skipped, pre-fetch tile 0 of the next q row
            ki = lax.select(_block_below_or_on_diag(qi, block_q, ki, block_kv), ki, 0)
        return (bi, hi, ki, 0)

    def kseg_index_map(bi, hi, qi, ki):
        if causal:
            ki = lax.select(_block_below_or_on_diag(qi, block_q, ki, block_kv), ki, 0)
        return (bi, 0, ki)

    def ktab_index_map(bi, hi, qi, ki):
        if causal:
            ki = lax.select(_block_below_or_on_diag(qi, block_q, ki, block_kv), ki, 0)
        return (ki, 0)

    in_specs = [
        pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
        pl.BlockSpec((1, 1, block_kv, d), kv_index_map),
        pl.BlockSpec((1, 1, block_kv, d), kv_index_map),
    ]
    args = [q, k, v]
    kw = dict(causal=causal, sm_scale=sm_scale, mask_value=mask_value,
              num_kv_blocks=nk, block_q=block_q, block_kv=block_kv)
    if has_seg:
        in_specs += [
            pl.BlockSpec((1, block_q, NUM_SUBLANES), lambda bi, hi, qi, ki: (bi, qi, 0)),
            pl.BlockSpec((1, NUM_SUBLANES, block_kv), kseg_index_map),
        ]
        args += [q_segment_ids, kv_segment_ids]
    if has_xpos:
        qtab_spec = pl.BlockSpec((block_q, d), lambda bi, hi, qi, ki: (qi, 0))
        ktab_spec = pl.BlockSpec((block_kv, d), ktab_index_map)
        in_specs += [qtab_spec, qtab_spec, ktab_spec, ktab_spec]
        args += list(xpos_tables)

    def kernel(*refs):
        i = 3
        qseg = kseg = qsin = qcos = ksin = kcos = None
        if has_seg:
            qseg, kseg = refs[i:i + 2]
            i += 2
        if has_xpos:
            qsin, qcos, ksin, kcos = refs[i:i + 4]
            i += 4
        o_r, l_r, m_r, m_s, l_s, a_s = refs[i:i + 6]
        return _fwd_kernel(refs[0], refs[1], refs[2], qseg, kseg,
                           qsin, qcos, ksin, kcos, o_r, l_r, m_r,
                           m_s, l_s, a_s, **kw)

    o, l, m = pl.pallas_call(
        kernel,
        grid=(b, h, nq, nk),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, block_q, NUM_SUBLANES), lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, block_q, NUM_SUBLANES), lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, lq, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, lq, NUM_SUBLANES), jnp.float32),
            jax.ShapeDtypeStruct((b, h, lq, NUM_SUBLANES), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, NUM_LANES), jnp.float32),
            pltpu.VMEM((block_q, NUM_LANES), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(*args)
    return o, l, m


# ---------------------------------------------------------------------------
# Backward kernels
# ---------------------------------------------------------------------------

def _recompute_p(q, k, l, m, *, sm_scale, causal, qi, ki, qseg, kseg,
                 mask_value, block_q, block_kv):
    """Recompute the normalized (block_q, block_kv) softmax tile from
    residuals. l/m: (block_q, 1); m is in the log2 domain (see LOG2E)."""
    s = lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
    s = s * (sm_scale * LOG2E)
    mask = _tile_mask(causal, qi, ki, qseg, kseg, block_q, block_kv)
    if mask is not None:
        s = jnp.where(mask, s, mask_value)
    l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
    p = jnp.exp2(s - m) * l_inv
    return p, mask


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, l_ref, m_ref, di_ref,
                    qseg_ref, kseg_ref,
                    qsin_ref, qcos_ref, ksin_ref, kcos_ref,
                    dk_ref, dv_ref,
                    dk_scr, dv_scr,
                    *, causal, sm_scale, mask_value, num_q_blocks,
                    block_q, block_kv):
    ki = pl.program_id(2)
    qi = pl.program_id(3)

    @pl.when(qi == (ki * block_kv) // block_q if causal else qi == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    should_run = _block_below_or_on_diag(qi, block_q, ki, block_kv) if causal else True

    @pl.when(should_run)
    def _run():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        if qsin_ref is not None:  # rotate into the xPos basis (fwd parity)
            rot = _rot_matrix(q.shape[-1])
            q = _apply_rot(q, qsin_ref[...], qcos_ref[...], rot)
            k = _apply_rot(k, ksin_ref[...], kcos_ref[...], rot)
        do = do_ref[0, 0].astype(jnp.float32)
        l = l_ref[0, 0][:, :1]
        m = m_ref[0, 0][:, :1]
        di = di_ref[0, 0][:, :1]
        qseg = qseg_ref[0][:, :1] if qseg_ref is not None else None
        kseg = kseg_ref[0][:1, :] if kseg_ref is not None else None

        p, mask = _recompute_p(q, k, l, m, sm_scale=sm_scale, causal=causal,
                               qi=qi, ki=ki, qseg=qseg, kseg=kseg,
                               mask_value=mask_value,
                               block_q=block_q, block_kv=block_kv)
        dv_scr[...] += lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = lax.dot_general(do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
        ds = p * (dp - di)
        if sm_scale != 1.0:
            ds = ds * sm_scale
        if mask is not None:
            ds = jnp.where(mask, ds, 0.0)
        dk_scr[...] += lax.dot_general(
            ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(qi == num_q_blocks - 1)
    def _store():
        dk_rot = dk_scr[...]
        if ksin_ref is not None:
            # accumulated grads are w.r.t. rotated keys; map back (R^T = -R)
            dk_rot = _apply_rot_transpose(dk_rot, ksin_ref[...],
                                          kcos_ref[...],
                                          _rot_matrix(dk_rot.shape[-1]))
        dk_ref[0, 0] = dk_rot.astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[...].astype(dv_ref.dtype)


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, l_ref, m_ref, di_ref,
                   qseg_ref, kseg_ref,
                   qsin_ref, qcos_ref, ksin_ref, kcos_ref,
                   dq_ref,
                   dq_scr,
                   *, causal, sm_scale, mask_value, num_kv_blocks,
                   block_q, block_kv):
    qi = pl.program_id(2)
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    should_run = _block_below_or_on_diag(qi, block_q, ki, block_kv) if causal else True

    @pl.when(should_run)
    def _run():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        if qsin_ref is not None:
            rot = _rot_matrix(q.shape[-1])
            q = _apply_rot(q, qsin_ref[...], qcos_ref[...], rot)
            k = _apply_rot(k, ksin_ref[...], kcos_ref[...], rot)
        do = do_ref[0, 0].astype(jnp.float32)
        l = l_ref[0, 0][:, :1]
        m = m_ref[0, 0][:, :1]
        di = di_ref[0, 0][:, :1]
        qseg = qseg_ref[0][:, :1] if qseg_ref is not None else None
        kseg = kseg_ref[0][:1, :] if kseg_ref is not None else None

        p, mask = _recompute_p(q, k, l, m, sm_scale=sm_scale, causal=causal,
                               qi=qi, ki=ki, qseg=qseg, kseg=kseg,
                               mask_value=mask_value,
                               block_q=block_q, block_kv=block_kv)
        dp = lax.dot_general(do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
        ds = p * (dp - di)
        if sm_scale != 1.0:
            ds = ds * sm_scale
        if mask is not None:
            ds = jnp.where(mask, ds, 0.0)
        dq_scr[...] += lax.dot(ds, k.astype(jnp.float32),
                               preferred_element_type=jnp.float32)

    @pl.when(ki == num_kv_blocks - 1)
    def _store():
        dq_rot = dq_scr[...]
        if qsin_ref is not None:
            dq_rot = _apply_rot_transpose(dq_rot, qsin_ref[...],
                                          qcos_ref[...],
                                          _rot_matrix(dq_rot.shape[-1]))
        dq_ref[0, 0] = dq_rot.astype(dq_ref.dtype)


def _bwd(q, k, v, q_segment_ids, kv_segment_ids, xpos_tables, o, l, m, do, *,
         causal, sm_scale, block_q, block_kv, mask_value, interpret):
    b, h, lq, d = q.shape
    lk = k.shape[2]
    nq = lq // block_q
    nk = lk // block_kv
    has_seg = q_segment_ids is not None
    has_xpos = xpos_tables is not None

    di = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)  # (B,H,Lq)
    di = jnp.broadcast_to(di[..., None], (b, h, lq, NUM_SUBLANES))

    qo_spec = pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, ji, ii: (bi, hi, ii, 0))
    kv_spec = pl.BlockSpec((1, 1, block_kv, d), lambda bi, hi, ji, ii: (bi, hi, ji, 0))
    lm_spec = pl.BlockSpec((1, 1, block_q, NUM_SUBLANES),
                           lambda bi, hi, ji, ii: (bi, hi, ii, 0))
    in_specs = [qo_spec, kv_spec, kv_spec, qo_spec, lm_spec, lm_spec, lm_spec]
    args = [q, k, v, do, l, m, di]
    kw = dict(causal=causal, sm_scale=sm_scale, mask_value=mask_value,
              num_q_blocks=nq, block_q=block_q, block_kv=block_kv)
    if has_seg:
        in_specs += [
            pl.BlockSpec((1, block_q, NUM_SUBLANES), lambda bi, hi, ji, ii: (bi, ii, 0)),
            pl.BlockSpec((1, NUM_SUBLANES, block_kv), lambda bi, hi, ji, ii: (bi, 0, ji)),
        ]
        args += [q_segment_ids, kv_segment_ids]
    if has_xpos:
        in_specs += [
            pl.BlockSpec((block_q, d), lambda bi, hi, ji, ii: (ii, 0)),
            pl.BlockSpec((block_q, d), lambda bi, hi, ji, ii: (ii, 0)),
            pl.BlockSpec((block_kv, d), lambda bi, hi, ji, ii: (ji, 0)),
            pl.BlockSpec((block_kv, d), lambda bi, hi, ji, ii: (ji, 0)),
        ]
        args += list(xpos_tables)

    def kern(*refs):
        i = 7
        qseg = kseg = qsin = qcos = ksin = kcos = None
        if has_seg:
            qseg, kseg = refs[i:i + 2]
            i += 2
        if has_xpos:
            qsin, qcos, ksin, kcos = refs[i:i + 4]
            i += 4
        dk_r, dv_r, dks, dvs = refs[i:i + 4]
        return _bwd_dkv_kernel(*refs[:7], qseg, kseg, qsin, qcos, ksin, kcos,
                               dk_r, dv_r, dks, dvs, **kw)

    dk, dv = pl.pallas_call(
        kern,
        grid=(b, h, nk, nq),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, block_kv, d), lambda bi, hi, ji, ii: (bi, hi, ji, 0)),
            pl.BlockSpec((1, 1, block_kv, d), lambda bi, hi, ji, ii: (bi, hi, ji, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, lk, d), k.dtype),
            jax.ShapeDtypeStruct((b, h, lk, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_kv, d), jnp.float32),
            pltpu.VMEM((block_kv, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(*args)

    # --- dQ: grid (b, h, nq, nk) ---
    qo_spec_q = pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, ii, ji: (bi, hi, ii, 0))

    def kv_index_map(bi, hi, ii, ji):
        if causal:
            ji = lax.select(_block_below_or_on_diag(ii, block_q, ji, block_kv), ji, 0)
        return (bi, hi, ji, 0)

    kv_spec_q = pl.BlockSpec((1, 1, block_kv, d), kv_index_map)
    lm_spec_q = pl.BlockSpec((1, 1, block_q, NUM_SUBLANES),
                             lambda bi, hi, ii, ji: (bi, hi, ii, 0))
    in_specs_q = [qo_spec_q, kv_spec_q, kv_spec_q, qo_spec_q,
                  lm_spec_q, lm_spec_q, lm_spec_q]
    args_q = [q, k, v, do, l, m, di]
    kwq = dict(causal=causal, sm_scale=sm_scale, mask_value=mask_value,
               num_kv_blocks=nk, block_q=block_q, block_kv=block_kv)
    if has_seg:
        def kseg_index_map(bi, hi, ii, ji):
            if causal:
                ji = lax.select(_block_below_or_on_diag(ii, block_q, ji, block_kv), ji, 0)
            return (bi, 0, ji)

        in_specs_q += [
            pl.BlockSpec((1, block_q, NUM_SUBLANES), lambda bi, hi, ii, ji: (bi, ii, 0)),
            pl.BlockSpec((1, NUM_SUBLANES, block_kv), kseg_index_map),
        ]
        args_q += [q_segment_ids, kv_segment_ids]
    if has_xpos:
        def ktab_index_map_q(bi, hi, ii, ji):
            if causal:
                ji = lax.select(_block_below_or_on_diag(ii, block_q, ji, block_kv), ji, 0)
            return (ji, 0)

        in_specs_q += [
            pl.BlockSpec((block_q, d), lambda bi, hi, ii, ji: (ii, 0)),
            pl.BlockSpec((block_q, d), lambda bi, hi, ii, ji: (ii, 0)),
            pl.BlockSpec((block_kv, d), ktab_index_map_q),
            pl.BlockSpec((block_kv, d), ktab_index_map_q),
        ]
        args_q += list(xpos_tables)

    def kern_q(*refs):
        i = 7
        qseg = kseg = qsin = qcos = ksin = kcos = None
        if has_seg:
            qseg, kseg = refs[i:i + 2]
            i += 2
        if has_xpos:
            qsin, qcos, ksin, kcos = refs[i:i + 4]
            i += 4
        dq_r, dqs = refs[i:i + 2]
        return _bwd_dq_kernel(*refs[:7], qseg, kseg, qsin, qcos, ksin, kcos,
                              dq_r, dqs, **kwq)

    dq = pl.pallas_call(
        kern_q,
        grid=(b, h, nq, nk),
        in_specs=in_specs_q,
        out_specs=pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, ii, ji: (bi, hi, ii, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, lq, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(*args_q)

    return dq, dk, dv


# ---------------------------------------------------------------------------
# Public API with custom VJP + ragged-length padding wrapper
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11, 12))
def _flash(q, k, v, q_segment_ids, kv_segment_ids,
           causal, sm_scale, block_q, block_kv, mask_value, interpret,
           xpos_scale_base, xpos_center):
    o, _, _ = _fwd(q, k, v, q_segment_ids, kv_segment_ids,
                   _maybe_tables(q, k, xpos_scale_base, xpos_center),
                   causal=causal, sm_scale=sm_scale, block_q=block_q,
                   block_kv=block_kv, mask_value=mask_value,
                   interpret=interpret)
    return o


def _maybe_tables(q, k, xpos_scale_base, xpos_center):
    if xpos_scale_base is None:
        return None
    return _xpos_tables(q.shape[2], k.shape[2], q.shape[3],
                        xpos_scale_base, xpos_center)


def _flash_fwd(q, k, v, q_segment_ids, kv_segment_ids,
               causal, sm_scale, block_q, block_kv, mask_value, interpret,
               xpos_scale_base, xpos_center):
    o, l, m = _fwd(q, k, v, q_segment_ids, kv_segment_ids,
                   _maybe_tables(q, k, xpos_scale_base, xpos_center),
                   causal=causal, sm_scale=sm_scale, block_q=block_q,
                   block_kv=block_kv, mask_value=mask_value,
                   interpret=interpret)
    return o, (q, k, v, q_segment_ids, kv_segment_ids, o, l, m)


def _flash_bwd(causal, sm_scale, block_q, block_kv, mask_value, interpret,
               xpos_scale_base, xpos_center, res, do):
    q, k, v, q_segment_ids, kv_segment_ids, o, l, m = res
    dq, dk, dv = _bwd(q, k, v, q_segment_ids, kv_segment_ids,
                      _maybe_tables(q, k, xpos_scale_base, xpos_center),
                      o, l, m, do,
                      causal=causal, sm_scale=sm_scale, block_q=block_q,
                      block_kv=block_kv, mask_value=mask_value,
                      interpret=interpret)
    return dq, dk, dv, None, None


_flash.defvjp(_flash_fwd, _flash_bwd)


def _pad_to(x, length, axis, value=0):
    pad = length - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def flash_attention(q, k, v, *, causal=True, sm_scale=1.0,
                    q_segment_ids=None, kv_segment_ids=None,
                    block_q=512, block_kv=512,
                    mask_value=DEFAULT_MASK_VALUE, interpret=False,
                    xpos_scale_base=None, xpos_center=None):
    """Flash attention over (B, H, L, D) tensors.

    - ``q_segment_ids``/``kv_segment_ids``: (B, Lq)/(B, Lk) int32; positions
      attend only within equal segment ids (padding masks and packed
      multi-document batches — the mask machinery the reference never wires
      through, SURVEY.md §3.4).
    - Ragged lengths are padded to block multiples internally; padded KV is
      hidden via synthesized segment ids.
    - ``xpos_scale_base``/``xpos_center``: when set, xPos rotation+decay is
      FUSED into the kernels (fwd and bwd) — pass UN-rotated q/k. Equivalent
      to ``apply_xpos(q/k, scale_base=..., center=...)`` outside, minus two
      full fp32 HBM passes over (B, H, L, hd) per layer.
    - Assumes Lq == Lk alignment at the top-left for the causal path
      (training/prefill). For cached decode use the jnp attention path.
    """
    b, h, lq, d = q.shape
    lk = k.shape[2]
    # keep blocks lane-aligned (multiples of 128) even for short sequences
    block_q = min(block_q, _cdiv(lq, NUM_LANES) * NUM_LANES)
    block_kv = min(block_kv, _cdiv(lk, NUM_LANES) * NUM_LANES)
    lq_pad = _cdiv(lq, block_q) * block_q
    lk_pad = _cdiv(lk, block_kv) * block_kv

    needs_seg = (q_segment_ids is not None) or (lq_pad != lq) or (lk_pad != lk)
    qs = ks = None
    if needs_seg:
        if q_segment_ids is None:
            q_segment_ids = jnp.zeros((b, lq), jnp.int32)
            kv_segment_ids = jnp.zeros((b, lk), jnp.int32)
        # padded q rows get -1, padded kv cols -2: pad never attends/attended
        qseg = _pad_to(q_segment_ids.astype(jnp.int32), lq_pad, 1, value=-1)
        kseg = _pad_to(kv_segment_ids.astype(jnp.int32), lk_pad, 1, value=-2)
        qs = jnp.broadcast_to(qseg[:, :, None], (b, lq_pad, NUM_SUBLANES))
        ks = jnp.broadcast_to(kseg[:, None, :], (b, NUM_SUBLANES, lk_pad))

    qp = _pad_to(q, lq_pad, 2)
    kp = _pad_to(k, lk_pad, 2)
    vp = _pad_to(v, lk_pad, 2)

    if xpos_scale_base is not None and xpos_center is None:
        xpos_center = lq // 2  # torchscale full-sequence centering
    o = _flash(qp, kp, vp, qs, ks, causal, float(sm_scale),
               int(block_q), int(block_kv), float(mask_value), bool(interpret),
               None if xpos_scale_base is None else float(xpos_scale_base),
               None if xpos_scale_base is None else int(xpos_center))
    if lq_pad != lq:
        o = o[:, :, :lq]
    return o
