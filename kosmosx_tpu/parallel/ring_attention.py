"""Ring flash attention over a ``sequence`` mesh axis (context parallelism).

The reference has no sequence/context parallelism of any kind (SURVEY.md
§2.3, §5): its long-context story is xPos extrapolation with a positional
table that would overflow past ~2046 tokens. This module goes beyond parity
and makes context length scale with the mesh: shard the sequence over a
``sequence`` axis, keep q local, and rotate K/V shards around the ring with
``lax.ppermute`` while merging per-shard flash-attention partials with the
standard log-sum-exp combine. Peak memory per chip is O(L/S) and the K/V
transfers ride ICI neighbor links (a ring is exactly the ICI topology).

Built on the Pallas flash kernels (ops/flash_attention._fwd/_bwd):

- forward: python-unrolled ring (S static steps). Step 0 runs the causal
  kernel on the local (q_i, kv_i) pair; step r>0 runs the non-causal kernel
  against the shard received from ``i-r`` and the merge is gated by the
  causal validity ``i >= r`` (upper-triangle pairs are computed and
  discarded — the simple schedule; a load-balanced zigzag variant can halve
  that waste later).
- backward: custom VJP ring that rotates (K, V) *and* the (dK, dV)
  accumulators together; each device adds its pair's contribution while it
  holds the shard, and one final ppermute returns the accumulators to their
  owners. Gradients recompute per-pair softmax tiles from the GLOBAL (l, m)
  residuals, so the math is exactly flash-attention-2's decomposition.
- the merge runs in the log2 domain to match the kernels' exp2 softmax
  (ops/flash_attention.LOG2E).

xPos note: rotation/decay depends on absolute positions, so for ring usage
apply ``nn.xpos.apply_xpos`` with each shard's global ``offset`` BEFORE
calling this (the fused-xPos kernel path assumes offset 0).
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


def _ring_fwd_impl(q, k, v, axis_name, causal, sm_scale, block_q, block_kv,
                   interpret):
    s = _axis_size(axis_name)
    i = lax.axis_index(axis_name)
    b, h, lq, d = q.shape

    o = jnp.zeros((b, h, lq, d), jnp.float32)
    l = jnp.zeros((b, h, lq, 1), jnp.float32)
    m = jnp.full((b, h, lq, 1), -jnp.inf, jnp.float32)
    kk, vv = k, v
    for r in range(s):
        oi, li, mi = _fwd(q, kk, vv, None, None, None,
                          causal=causal and r == 0, sm_scale=sm_scale,
                          block_q=block_q, block_kv=block_kv,
                          mask_value=DEFAULT_MASK_VALUE, interpret=interpret)
        oi = oi.astype(jnp.float32)
        li = li[..., :1]
        mi = mi[..., :1]
        if causal and r > 0:
            valid = i >= r
            li = jnp.where(valid, li, 0.0)
            mi = jnp.where(valid, mi, -jnp.inf)
        o, l, m = _merge(o, l, m, oi, li, mi)
        if r != s - 1:
            kk, vv = lax.ppermute((kk, vv), axis_name, perm=_ring_perm(s))
    return o.astype(q.dtype), l, m


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def _ring(q, k, v, axis_name, causal, sm_scale, block_q, block_kv, interpret):
    o, _, _ = _ring_fwd_impl(q, k, v, axis_name, causal, sm_scale,
                             block_q, block_kv, interpret)
    return o


def _ring_vjp_fwd(q, k, v, axis_name, causal, sm_scale, block_q, block_kv,
                  interpret):
    o, l, m = _ring_fwd_impl(q, k, v, axis_name, causal, sm_scale,
                             block_q, block_kv, interpret)
    return o, (q, k, v, o, l, m)


def _ring_vjp_bwd(axis_name, causal, sm_scale, block_q, block_kv, interpret,
                  res, do):
    q, k, v, o, l, m = res
    s = _axis_size(axis_name)
    i = lax.axis_index(axis_name)
    b, h, lq, d = q.shape
    l8 = jnp.broadcast_to(l, (b, h, lq, NUM_SUBLANES))
    m8 = jnp.broadcast_to(m, (b, h, lq, NUM_SUBLANES))

    dq = jnp.zeros(q.shape, jnp.float32)
    kk, vv = k, v
    dkk = jnp.zeros(k.shape, jnp.float32)
    dvv = jnp.zeros(v.shape, jnp.float32)
    for r in range(s):
        dq_c, dk_c, dv_c = _bwd(q, kk, vv, None, None, None, o, l8, m8, do,
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
            kk, vv, dkk, dvv = lax.ppermute((kk, vv, dkk, dvv), axis_name,
                                            perm=_ring_perm(s))
    # shard j's accumulator sits on device (j - 1) mod s; one more hop home
    dkk, dvv = lax.ppermute((dkk, dvv), axis_name, perm=_ring_perm(s))
    return dq.astype(q.dtype), dkk.astype(k.dtype), dvv.astype(v.dtype)


_ring.defvjp(_ring_vjp_fwd, _ring_vjp_bwd)


def ring_flash_attention(q, k, v, axis_name: str, *, causal: bool = True,
                         sm_scale: float = 1.0, block_q: int = 512,
                         block_kv: int = 512, interpret: bool = False):
    """Flash attention with the sequence sharded over ``axis_name``.

    Call INSIDE ``shard_map`` (pass ``check_vma=False`` — pallas_call does
    not carry the varying-mesh-axes metadata jax 0.9's checker wants) with
    per-shard ``q``/``k``/``v`` of shape (B, H, L/S, D); returns the local
    output shard (B, H, L/S, D). Differentiable (custom ring VJP).

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
    return _ring(q, k, v, axis_name, bool(causal), float(sm_scale),
                 int(block_q), int(block_kv), bool(interpret))
