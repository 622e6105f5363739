"""Ring flash attention over a ``sequence`` mesh axis (context parallelism).

The reference has no sequence/context parallelism of any kind (SURVEY.md
§2.3, §5): its long-context story is xPos extrapolation with a positional
table that would overflow past ~2046 tokens. This module goes beyond parity
and makes context length scale with the mesh: shard the sequence over a
``sequence`` axis, keep q local, and rotate K/V shards around the ring with
``lax.ppermute`` while merging per-shard flash-attention partials with the
standard log-sum-exp combine. Peak memory per chip is O(L/S) and the K/V
transfers ride ICI neighbor links (a ring is exactly the ICI topology).

Two schedules, both built on the Pallas flash kernels
(ops/flash_attention._fwd/_bwd), both with segment-id (padding / packed
document) masking riding the ring alongside K/V:

- ``ring_flash_attention`` — the simple contiguous-shard schedule. Step 0
  runs the causal kernel on the local (q_i, kv_i) pair; step r>0 runs the
  non-causal kernel against the shard received from ``i-r``, gated by the
  causal validity ``i >= r``. Upper-triangle pairs are computed and
  discarded, so device S-1 does ~S/2x the useful work of device 0.
- ``zigzag_ring_flash_attention`` — the load-balanced schedule. The global
  sequence is split into 2S chunks and device ``i`` holds chunks
  ``(i, 2S-1-i)`` (see ``zigzag_permute``). Every device then runs exactly
  the same number of kernel calls per ring step (r=0: two causal halves +
  one full pair; r>0: two full pairs, one of them selected by ``i vs j``),
  eliminating the discarded upper-triangle work — ~2x less attention
  compute at large S for identical results.

- backward: custom VJP rings that rotate (K, V) *and* the (dK, dV)
  accumulators together; each device adds its pair's contribution while it
  holds the shard, and one final ppermute returns the accumulators to their
  owners. Gradients recompute per-pair softmax tiles from the GLOBAL (l, m)
  residuals, so the math is exactly flash-attention-2's decomposition.
- the merge runs in the log2 domain to match the kernels' exp2 softmax
  (ops/flash_attention.LOG2E).

xPos note: rotation/decay depends on absolute positions, so apply
``nn.xpos.apply_xpos`` with each shard's (zigzag: each half's) global
``offset`` BEFORE calling this (the fused-xPos kernel path assumes offset 0).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from kosmosx_tpu.ops.flash_attention import (DEFAULT_MASK_VALUE, NUM_SUBLANES,
                                             _bwd, _fwd)


def _axis_size(axis_name: str) -> int:
    return jax.lax.psum(1, axis_name)


def _merge(o1, l1, m1, o2, l2, m2):
    """Combine two NORMALIZED flash partials. Stats (B, H, L, 1) fp32 in the
    log2 domain; o fp32."""
    m = jnp.maximum(m1, m2)
    # guard -inf - -inf = nan for rows no partial has covered yet
    msafe = jnp.where(jnp.isneginf(m), 0.0, m)
    a1 = jnp.where(jnp.isneginf(m1), 0.0, jnp.exp2(m1 - msafe))
    a2 = jnp.where(jnp.isneginf(m2), 0.0, jnp.exp2(m2 - msafe))
    w1 = l1 * a1
    w2 = l2 * a2
    l = w1 + w2
    inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
    o = (o1 * w1 + o2 * w2) * inv
    return o, l, m


def _ring_perm(s: int):
    return [(d, (d + 1) % s) for d in range(s)]


def _qseg_layout(seg):
    """(B, L) int32 -> (B, L, 8) kernel layout (or None)."""
    if seg is None:
        return None
    b, l = seg.shape
    return jnp.broadcast_to(seg.astype(jnp.int32)[:, :, None],
                            (b, l, NUM_SUBLANES))


def _kseg_layout(seg):
    """(B, L) int32 -> (B, 8, L) kernel layout (or None)."""
    if seg is None:
        return None
    b, l = seg.shape
    return jnp.broadcast_to(seg.astype(jnp.int32)[:, None, :],
                            (b, NUM_SUBLANES, l))


def _gate(valid, li, mi):
    """Zero a partial's merge weight where ``valid`` is False."""
    return jnp.where(valid, li, 0.0), jnp.where(valid, mi, -jnp.inf)


# ---------------------------------------------------------------------------
# Contiguous-shard ring
# ---------------------------------------------------------------------------

def _ring_fwd_impl(q, k, v, qseg, kseg, axis_name, causal, sm_scale, block_q,
                   block_kv, interpret):
    s = _axis_size(axis_name)
    i = lax.axis_index(axis_name)
    b, h, lq, d = q.shape

    o = jnp.zeros((b, h, lq, d), jnp.float32)
    l = jnp.zeros((b, h, lq, 1), jnp.float32)
    m = jnp.full((b, h, lq, 1), -jnp.inf, jnp.float32)
    qs = _qseg_layout(qseg)
    kk, vv, ks = k, v, kseg
    for r in range(s):
        oi, li, mi = _fwd(q, kk, vv, qs, _kseg_layout(ks), None,
                          causal=causal and r == 0, sm_scale=sm_scale,
                          block_q=block_q, block_kv=block_kv,
                          mask_value=DEFAULT_MASK_VALUE, interpret=interpret)
        oi = oi.astype(jnp.float32)
        li = li[..., :1]
        mi = mi[..., :1]
        if causal and r > 0:
            li, mi = _gate(i >= r, li, mi)
        o, l, m = _merge(o, l, m, oi, li, mi)
        if r != s - 1:
            if ks is not None:
                kk, vv, ks = lax.ppermute((kk, vv, ks), axis_name,
                                          perm=_ring_perm(s))
            else:
                kk, vv = lax.ppermute((kk, vv), axis_name, perm=_ring_perm(s))
    return o.astype(q.dtype), l, m


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def _ring(q, k, v, qseg, kseg, axis_name, causal, sm_scale, block_q,
          block_kv, interpret):
    o, _, _ = _ring_fwd_impl(q, k, v, qseg, kseg, axis_name, causal, sm_scale,
                             block_q, block_kv, interpret)
    return o


def _ring_vjp_fwd(q, k, v, qseg, kseg, axis_name, causal, sm_scale, block_q,
                  block_kv, interpret):
    o, l, m = _ring_fwd_impl(q, k, v, qseg, kseg, axis_name, causal, sm_scale,
                             block_q, block_kv, interpret)
    return o, (q, k, v, qseg, kseg, o, l, m)


def _ring_vjp_bwd(axis_name, causal, sm_scale, block_q, block_kv, interpret,
                  res, do):
    q, k, v, qseg, kseg, o, l, m = res
    s = _axis_size(axis_name)
    i = lax.axis_index(axis_name)
    b, h, lq, d = q.shape
    l8 = jnp.broadcast_to(l, (b, h, lq, NUM_SUBLANES))
    m8 = jnp.broadcast_to(m, (b, h, lq, NUM_SUBLANES))
    qs = _qseg_layout(qseg)

    dq = jnp.zeros(q.shape, jnp.float32)
    kk, vv, ks = k, v, kseg
    dkk = jnp.zeros(k.shape, jnp.float32)
    dvv = jnp.zeros(v.shape, jnp.float32)
    for r in range(s):
        dq_c, dk_c, dv_c = _bwd(q, kk, vv, qs, _kseg_layout(ks), None,
                                o, l8, m8, do,
                                causal=causal and r == 0, sm_scale=sm_scale,
                                block_q=block_q, block_kv=block_kv,
                                mask_value=DEFAULT_MASK_VALUE,
                                interpret=interpret)
        if causal and r > 0:
            valid = i >= r
            dq_c = jnp.where(valid, dq_c.astype(jnp.float32), 0.0)
            dk_c = jnp.where(valid, dk_c.astype(jnp.float32), 0.0)
            dv_c = jnp.where(valid, dv_c.astype(jnp.float32), 0.0)
        dq = dq + dq_c.astype(jnp.float32)
        dkk = dkk + dk_c.astype(jnp.float32)
        dvv = dvv + dv_c.astype(jnp.float32)
        if r != s - 1:
            if ks is not None:
                kk, vv, ks, dkk, dvv = lax.ppermute(
                    (kk, vv, ks, dkk, dvv), axis_name, perm=_ring_perm(s))
            else:
                kk, vv, dkk, dvv = lax.ppermute((kk, vv, dkk, dvv), axis_name,
                                                perm=_ring_perm(s))
    # shard j's accumulator sits on device (j - 1) mod s; one more hop home
    dkk, dvv = lax.ppermute((dkk, dvv), axis_name, perm=_ring_perm(s))
    return dq.astype(q.dtype), dkk.astype(k.dtype), dvv.astype(v.dtype), None, None


_ring.defvjp(_ring_vjp_fwd, _ring_vjp_bwd)


def ring_flash_attention(q, k, v, axis_name: str, *, causal: bool = True,
                         sm_scale: float = 1.0,
                         q_segment_ids=None, kv_segment_ids=None,
                         block_q: int = 512,
                         block_kv: int = 512, interpret: bool = False):
    """Flash attention with the sequence sharded over ``axis_name``.

    Call INSIDE ``shard_map`` (pass ``check_vma=False`` — pallas_call does
    not carry the varying-mesh-axes metadata jax 0.9's checker wants) with
    per-shard ``q``/``k``/``v`` of shape (B, H, L/S, D); returns the local
    output shard (B, H, L/S, D). Differentiable (custom ring VJP).

    ``q_segment_ids``/``kv_segment_ids``: per-shard (B, L/S) int32; positions
    attend only within equal ids (padding masks / packed documents). The kv
    ids ride the ring with K/V.

    The local shard length must be a multiple of 128 (lane width); block
    sizes shrink to the shard length automatically.
    """
    lq = q.shape[2]
    lk = k.shape[2]
    if lq % 128 or lk % 128:
        raise ValueError(f"ring attention needs shard lengths % 128 == 0; "
                         f"got q {lq}, kv {lk} (pad the global sequence so "
                         f"each of the mesh's sequence shards is aligned)")
    block_q = min(block_q, lq)
    block_kv = min(block_kv, lk)
    if lq % block_q or lk % block_kv:
        raise ValueError(f"shard lengths ({lq}, {lk}) must be divisible by "
                         f"blocks ({block_q}, {block_kv})")
    if (q_segment_ids is None) != (kv_segment_ids is None):
        raise ValueError("pass both segment-id arrays or neither")
    return _ring(q, k, v, q_segment_ids, kv_segment_ids, axis_name,
                 bool(causal), float(sm_scale),
                 int(block_q), int(block_kv), bool(interpret))


# ---------------------------------------------------------------------------
# Zigzag-balanced ring
# ---------------------------------------------------------------------------

def zigzag_chunk_order(s: int):
    """Global chunk order for the zigzag layout: device d holds chunks
    (d, 2s-1-d) contiguously."""
    order = []
    for d in range(s):
        order += [d, 2 * s - 1 - d]
    return order


def zigzag_permute(x, s: int, axis: int = 1):
    """Reorder a GLOBAL sequence axis into the zigzag layout, so that
    contiguous ``L/S`` shards hold chunks (d, 2s-1-d)."""
    l = x.shape[axis]
    assert l % (2 * s) == 0, (l, s)
    c = l // (2 * s)
    shape = x.shape[:axis] + (2 * s, c) + x.shape[axis + 1:]
    xc = x.reshape(shape)
    idx = jnp.asarray(zigzag_chunk_order(s))
    return jnp.take(xc, idx, axis=axis).reshape(x.shape)


def zigzag_unpermute(x, s: int, axis: int = 1):
    """Inverse of :func:`zigzag_permute`."""
    order = zigzag_chunk_order(s)
    inv = [0] * len(order)
    for pos, ch in enumerate(order):
        inv[ch] = pos
    l = x.shape[axis]
    c = l // (2 * s)
    shape = x.shape[:axis] + (2 * s, c) + x.shape[axis + 1:]
    xc = x.reshape(shape)
    return jnp.take(xc, jnp.asarray(inv), axis=axis).reshape(x.shape)


def zigzag_position_offsets(i, local_len: int, s: int):
    """Per-position GLOBAL offset vector (local_len,) for a zigzag shard:
    ``global_pos = offset + arange(local_len)``. ``i`` may be traced
    (lax.axis_index)."""
    c = local_len // 2
    lo = jnp.full((c,), i * c, jnp.int32)
    hi = jnp.full((c,), (2 * s - 1 - i) * c - c, jnp.int32)
    return jnp.concatenate([lo, hi])


def _halves(t, axis=2):
    c = t.shape[axis] // 2
    lo = lax.slice_in_dim(t, 0, c, axis=axis)
    hi = lax.slice_in_dim(t, c, 2 * c, axis=axis)
    return lo, hi


def _zz_call_fwd(qc, kc, vc, qsc, ksc, causal, sm_scale, block_q, block_kv,
                 interpret):
    o, l, m = _fwd(qc, kc, vc, _qseg_layout(qsc), _kseg_layout(ksc), None,
                   causal=causal, sm_scale=sm_scale,
                   block_q=block_q, block_kv=block_kv,
                   mask_value=DEFAULT_MASK_VALUE, interpret=interpret)
    return o.astype(jnp.float32), l[..., :1], m[..., :1]


def _zz_fwd_impl(q, k, v, qseg, kseg, axis_name, sm_scale, block_q, block_kv,
                 interpret):
    s = _axis_size(axis_name)
    i = lax.axis_index(axis_name)
    b, h, l2c, d = q.shape
    c = l2c // 2
    bq = min(block_q, c)
    bkv = min(block_kv, c)

    q_lo, q_hi = _halves(q)
    qs_lo = qs_hi = None
    if qseg is not None:
        qs_lo, qs_hi = _halves(qseg, axis=1)

    def zero_acc():
        return (jnp.zeros((b, h, c, d), jnp.float32),
                jnp.zeros((b, h, c, 1), jnp.float32),
                jnp.full((b, h, c, 1), -jnp.inf, jnp.float32))

    acc_lo, acc_hi = zero_acc(), zero_acc()

    kk, vv, ks = k, v, kseg
    for r in range(s):
        j = (i - r) % s
        k_lo, k_hi = _halves(kk)
        v_lo, v_hi = _halves(vv)
        ks_lo = ks_hi = None
        if ks is not None:
            ks_lo, ks_hi = _halves(ks, axis=1)

        call = functools.partial(_zz_call_fwd, sm_scale=sm_scale,
                                 block_q=bq, block_kv=bkv,
                                 interpret=interpret)
        if r == 0:
            # chunks: (i,i) causal, (2s-1-i, 2s-1-i) causal, (2s-1-i, i) full
            acc_lo = _merge(*acc_lo, *call(q_lo, k_lo, v_lo, qs_lo, ks_lo,
                                           causal=True))
            acc_hi = _merge(*acc_hi, *call(q_hi, k_hi, v_hi, qs_hi, ks_hi,
                                           causal=True))
            acc_hi = _merge(*acc_hi, *call(q_hi, k_lo, v_lo, qs_hi, ks_lo,
                                           causal=False))
        else:
            # always valid: (2s-1-i, j) full
            acc_hi = _merge(*acc_hi, *call(q_hi, k_lo, v_lo, qs_hi, ks_lo,
                                           causal=False))
            # selected: i>j -> (i, j) full into lo; i<j -> (2s-1-i, 2s-1-j)
            # full into hi. Both devices run ONE call — balanced.
            lo_src = i > j
            q_sel = jnp.where(lo_src, q_lo, q_hi)
            k_sel = jnp.where(lo_src, k_lo, k_hi)
            v_sel = jnp.where(lo_src, v_lo, v_hi)
            qs_sel = (jnp.where(lo_src, qs_lo, qs_hi)
                      if qs_lo is not None else None)
            ks_sel = (jnp.where(lo_src, ks_lo, ks_hi)
                      if ks_lo is not None else None)
            o_s, l_s, m_s = call(q_sel, k_sel, v_sel, qs_sel, ks_sel,
                                 causal=False)
            acc_lo = _merge(*acc_lo, o_s, *_gate(lo_src, l_s, m_s))
            acc_hi = _merge(*acc_hi, o_s, *_gate(~lo_src, l_s, m_s))
        if r != s - 1:
            if ks is not None:
                kk, vv, ks = lax.ppermute((kk, vv, ks), axis_name,
                                          perm=_ring_perm(s))
            else:
                kk, vv = lax.ppermute((kk, vv), axis_name, perm=_ring_perm(s))

    o = jnp.concatenate([acc_lo[0], acc_hi[0]], axis=2).astype(q.dtype)
    l = jnp.concatenate([acc_lo[1], acc_hi[1]], axis=2)
    m = jnp.concatenate([acc_lo[2], acc_hi[2]], axis=2)
    return o, l, m


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _zigzag(q, k, v, qseg, kseg, axis_name, sm_scale, block_q, block_kv,
            interpret):
    o, _, _ = _zz_fwd_impl(q, k, v, qseg, kseg, axis_name, sm_scale, block_q,
                           block_kv, interpret)
    return o


def _zigzag_vjp_fwd(q, k, v, qseg, kseg, axis_name, sm_scale, block_q,
                    block_kv, interpret):
    o, l, m = _zz_fwd_impl(q, k, v, qseg, kseg, axis_name, sm_scale, block_q,
                           block_kv, interpret)
    return o, (q, k, v, qseg, kseg, o, l, m)


def _zz_call_bwd(qc, kc, vc, qsc, ksc, oc, lc, mc, doc, causal, sm_scale,
                 block_q, block_kv, interpret):
    b, h, c, d = qc.shape
    l8 = jnp.broadcast_to(lc, (b, h, c, NUM_SUBLANES))
    m8 = jnp.broadcast_to(mc, (b, h, c, NUM_SUBLANES))
    return _bwd(qc, kc, vc, _qseg_layout(qsc), _kseg_layout(ksc), None,
                oc, l8, m8, doc, causal=causal, sm_scale=sm_scale,
                block_q=block_q, block_kv=block_kv,
                mask_value=DEFAULT_MASK_VALUE, interpret=interpret)


def _zigzag_vjp_bwd(axis_name, sm_scale, block_q, block_kv, interpret,
                    res, do):
    q, k, v, qseg, kseg, o, l, m = res
    s = _axis_size(axis_name)
    i = lax.axis_index(axis_name)
    b, h, l2c, d = q.shape
    c = l2c // 2
    bq = min(block_q, c)
    bkv = min(block_kv, c)

    q_lo, q_hi = _halves(q)
    o_lo, o_hi = _halves(o)
    l_lo, l_hi = _halves(l)
    m_lo, m_hi = _halves(m)
    do_lo, do_hi = _halves(do)
    qs_lo = qs_hi = None
    if qseg is not None:
        qs_lo, qs_hi = _halves(qseg, axis=1)

    dq_lo = jnp.zeros((b, h, c, d), jnp.float32)
    dq_hi = jnp.zeros((b, h, c, d), jnp.float32)
    kk, vv, ks = k, v, kseg
    dkk = jnp.zeros(k.shape, jnp.float32)
    dvv = jnp.zeros(v.shape, jnp.float32)

    call = functools.partial(_zz_call_bwd, sm_scale=sm_scale, block_q=bq,
                             block_kv=bkv, interpret=interpret)

    def add_half(acc, half, delta):
        """acc (B,H,2C,D) += delta at the lo (half=0) / hi (half=1) slice."""
        lo, hi = _halves(acc)
        if half == 0:
            lo = lo + delta
        else:
            hi = hi + delta
        return jnp.concatenate([lo, hi], axis=2)

    for r in range(s):
        j = (i - r) % s
        k_lo, k_hi = _halves(kk)
        v_lo, v_hi = _halves(vv)
        ks_lo = ks_hi = None
        if ks is not None:
            ks_lo, ks_hi = _halves(ks, axis=1)

        if r == 0:
            dq_c, dk_c, dv_c = call(q_lo, k_lo, v_lo, qs_lo, ks_lo,
                                    o_lo, l_lo, m_lo, do_lo, causal=True)
            dq_lo += dq_c.astype(jnp.float32)
            dkk = add_half(dkk, 0, dk_c.astype(jnp.float32))
            dvv = add_half(dvv, 0, dv_c.astype(jnp.float32))
            dq_c, dk_c, dv_c = call(q_hi, k_hi, v_hi, qs_hi, ks_hi,
                                    o_hi, l_hi, m_hi, do_hi, causal=True)
            dq_hi += dq_c.astype(jnp.float32)
            dkk = add_half(dkk, 1, dk_c.astype(jnp.float32))
            dvv = add_half(dvv, 1, dv_c.astype(jnp.float32))
            dq_c, dk_c, dv_c = call(q_hi, k_lo, v_lo, qs_hi, ks_lo,
                                    o_hi, l_hi, m_hi, do_hi, causal=False)
            dq_hi += dq_c.astype(jnp.float32)
            dkk = add_half(dkk, 0, dk_c.astype(jnp.float32))
            dvv = add_half(dvv, 0, dv_c.astype(jnp.float32))
        else:
            dq_c, dk_c, dv_c = call(q_hi, k_lo, v_lo, qs_hi, ks_lo,
                                    o_hi, l_hi, m_hi, do_hi, causal=False)
            dq_hi += dq_c.astype(jnp.float32)
            dkk = add_half(dkk, 0, dk_c.astype(jnp.float32))
            dvv = add_half(dvv, 0, dv_c.astype(jnp.float32))

            lo_src = i > j
            q_sel = jnp.where(lo_src, q_lo, q_hi)
            k_sel = jnp.where(lo_src, k_lo, k_hi)
            v_sel = jnp.where(lo_src, v_lo, v_hi)
            qs_sel = (jnp.where(lo_src, qs_lo, qs_hi)
                      if qs_lo is not None else None)
            ks_sel = (jnp.where(lo_src, ks_lo, ks_hi)
                      if ks_lo is not None else None)
            o_sel = jnp.where(lo_src, o_lo, o_hi)
            l_sel = jnp.where(lo_src, l_lo, l_hi)
            m_sel = jnp.where(lo_src, m_lo, m_hi)
            do_sel = jnp.where(lo_src, do_lo, do_hi)
            dq_c, dk_c, dv_c = call(q_sel, k_sel, v_sel, qs_sel, ks_sel,
                                    o_sel, l_sel, m_sel, do_sel, causal=False)
            dq_c = dq_c.astype(jnp.float32)
            dk_c = dk_c.astype(jnp.float32)
            dv_c = dv_c.astype(jnp.float32)
            zero = jnp.zeros_like(dq_c)
            dq_lo += jnp.where(lo_src, dq_c, zero)
            dq_hi += jnp.where(lo_src, zero, dq_c)
            dkk = add_half(dkk, 0, jnp.where(lo_src, dk_c, zero))
            dkk = add_half(dkk, 1, jnp.where(lo_src, zero, dk_c))
            dvv = add_half(dvv, 0, jnp.where(lo_src, dv_c, zero))
            dvv = add_half(dvv, 1, jnp.where(lo_src, zero, dv_c))

        if r != s - 1:
            if ks is not None:
                kk, vv, ks, dkk, dvv = lax.ppermute(
                    (kk, vv, ks, dkk, dvv), axis_name, perm=_ring_perm(s))
            else:
                kk, vv, dkk, dvv = lax.ppermute((kk, vv, dkk, dvv), axis_name,
                                                perm=_ring_perm(s))
    dkk, dvv = lax.ppermute((dkk, dvv), axis_name, perm=_ring_perm(s))
    dq = jnp.concatenate([dq_lo, dq_hi], axis=2)
    return (dq.astype(q.dtype), dkk.astype(k.dtype), dvv.astype(v.dtype),
            None, None)


_zigzag.defvjp(_zigzag_vjp_fwd, _zigzag_vjp_bwd)


def zigzag_ring_flash_attention(q, k, v, axis_name: str, *,
                                sm_scale: float = 1.0,
                                q_segment_ids=None, kv_segment_ids=None,
                                block_q: int = 512, block_kv: int = 512,
                                interpret: bool = False):
    """Load-balanced causal ring attention (zigzag schedule).

    Per-shard inputs must be in the ZIGZAG layout (``zigzag_permute`` the
    global sequence first): device ``i``'s (B, H, L/S, D) shard holds global
    chunks ``i`` and ``2S-1-i``, each of length L/(2S). Apply xPos per half
    with each chunk's global offset before calling. Differentiable.
    """
    lq = q.shape[2]
    if lq != k.shape[2]:
        raise ValueError("zigzag ring requires q/kv shards of equal length")
    if (lq // 2) % 128:
        raise ValueError(f"zigzag ring needs half-shard length % 128 == 0; "
                         f"got shard {lq}")
    if (q_segment_ids is None) != (kv_segment_ids is None):
        raise ValueError("pass both segment-id arrays or neither")
    return _zigzag(q, k, v, q_segment_ids, kv_segment_ids, axis_name,
                   float(sm_scale), int(block_q), int(block_kv),
                   bool(interpret))
