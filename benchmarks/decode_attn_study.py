"""Decode-attention S-sweep: XLA's M=1 cached-attention einsums vs the
Pallas decode kernel (ops/decode_attention.py), on chip.

Context (BASELINE.md): the kv8 rolling-window serving row showed shrinking a
3.2 GB cache read 4x saved only ~3.6 ms/step — the decode step's attention
einsums move cache bytes at an effective ~60-65 GB/s against the chip's
~345 GB/s measured flat-read wall. This study isolates that: one decode
step's attention (q (B,H,1,hd) over a (B,H,S,hd) cache), N back-to-back
iterations inside one jit (re-reads the cache from HBM each time exactly
like the real 24-layer step), scalar-fetched, distinct q per iteration via
a score-feedback carry; timed at N and 2N so the per-call tunnel RTT
cancels in the difference.

Prints per (path, S, dtype): ms/iter and effective cache GB/s
(= K+V bytes / time; the q/output traffic is negligible).

Usage: python benchmarks/decode_attn_study.py [--batch 8] [--heads 32]
       [--sweep 512,2048,8192] [--calls 3]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from kosmosx_tpu.ops.decode_attention import decode_attention

LAYERS = 24


def _quantize(x):
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    codes = jnp.clip(jnp.round(x.astype(jnp.float32) / scale),
                     -127, 127).astype(jnp.int8)
    return codes, scale


def einsum_path(q, k, v, kv_len, k_scale=None, v_scale=None):
    """The production einsum path's math (nn/attention._jnp_attention,
    decode subset: kv_len mask only)."""
    if k_scale is not None:
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k.astype(q.dtype),
                       preferred_element_type=jnp.float32)
        s = s * jnp.swapaxes(k_scale, -1, -2)
    else:
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       preferred_element_type=jnp.float32)
    lk = k.shape[2]
    valid = jnp.arange(lk)[None, None, None, :] < kv_len[:, None, None, None]
    s = jnp.where(valid, s, jnp.finfo(jnp.float32).min)
    p = jax.nn.softmax(s, axis=-1)
    if v_scale is not None:
        p = p * jnp.swapaxes(v_scale, -1, -2)
        return jnp.einsum("bhqk,bhkd->bhqd", p.astype(q.dtype),
                          v.astype(q.dtype))
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)


def measure(label, fn, q0, cache_args, cache_bytes, calls, n):
    """Chain attention calls in one jit, at TWO chain lengths (N and 2N),
    and report the per-iteration DIFFERENCE: one chained call still pays one
    ~26 ms tunnel RTT (a first-cut sweep read pure RTT floor at S=512), and
    the two-length delta cancels it exactly. q perturbed per iteration by
    the previous output (data dependence defeats the tunnel's identical-
    execution cache and forces sequential execution); the seed input makes
    each timed call a distinct request."""

    # caches ride as ARGUMENTS, not closure captures: closed-over device
    # arrays bake into the compile request as constants (S=8192 hit the
    # remote-compile HTTP 413 size limit)
    def chained(q, seed, *cache, length):
        def body(carry, _):
            qq = carry + seed * 1e-2  # bf16-representable vs |q| ~ 0.1
            o = fn(qq, *cache)
            # feed a rescaled output back in: keeps magnitudes ~q-like
            return (o * 0.5 + carry * 0.5).astype(q.dtype), ()

        out, _ = jax.lax.scan(body, q, None, length=length)
        return jnp.sum(out.astype(jnp.float32))

    run1 = jax.jit(functools.partial(chained, length=n))
    run2 = jax.jit(functools.partial(chained, length=2 * n))
    float(run1(q0, jnp.float32(0.0), *cache_args))  # compile
    float(run2(q0, jnp.float32(0.5), *cache_args))
    t1s, t2s = [], []
    for i in range(calls):
        t0 = time.perf_counter()
        float(run1(q0, jnp.float32(i + 1.0), *cache_args))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(run2(q0, jnp.float32(i + 101.0), *cache_args))
        t2s.append(time.perf_counter() - t0)
    best = (min(t2s) - min(t1s)) / n
    gbs = cache_bytes / best / 1e9 if best > 0 else float("inf")
    print(f"{label}: {best * 1e3:.3f} ms/iter = {gbs:.0f} GB/s effective "
          f"(N={n}: {[f'{t * 1e3:.0f}' for t in t1s]} ms, "
          f"2N: {[f'{t * 1e3:.0f}' for t in t2s]} ms)", flush=True)
    return best, gbs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--heads", type=int, default=32)
    ap.add_argument("--head-dim", type=int, default=64)
    ap.add_argument("--sweep", default="512,2048,8192")
    ap.add_argument("--calls", type=int, default=3)
    ap.add_argument("--int8", action="store_true",
                    help="also sweep the int8-cache variants")
    args = ap.parse_args()

    b, h, hd = args.batch, args.heads, args.head_dim
    print(f"devices: {jax.devices()}  B={b} H={h} hd={hd}", flush=True)
    for s_len in [int(x) for x in args.sweep.split(",")]:
        key = jax.random.PRNGKey(s_len)
        ks = jax.random.split(key, 3)
        q = jax.random.normal(ks[0], (b, h, 1, hd), jnp.float32) * 0.1
        q = q.astype(jnp.bfloat16)
        k = jax.random.normal(ks[1], (b, h, s_len, hd),
                              jnp.float32).astype(jnp.bfloat16)
        v = jax.random.normal(ks[2], (b, h, s_len, hd),
                              jnp.float32).astype(jnp.bfloat16)
        kv_len = jnp.full((b,), s_len, jnp.int32)
        cache_bytes = 2 * b * h * s_len * hd * 2  # K+V bf16
        # equalize total cache bytes across S (~13 GB per N-chain): the
        # delta method cancels the RTT, this keeps exec times comparable
        n = LAYERS * max(1, 8192 // s_len)
        measure(f"einsum  bf16 S={s_len}", einsum_path, q,
                (k, v, kv_len), cache_bytes, args.calls, n)
        measure(f"kernel  bf16 S={s_len}",
                lambda qq, kk, vv, ll: decode_attention(qq, kk, vv, ll),
                q, (k, v, kv_len), cache_bytes, args.calls, n)
        if args.int8:
            kq, ksc = _quantize(k)
            vq, vsc = _quantize(v)
            qbytes = 2 * b * h * s_len * (hd + 4)  # codes + fp32 scales
            measure(f"einsum  int8 S={s_len}",
                    lambda qq, kk, vv, ll, ksl, vsl: einsum_path(
                        qq, kk, vv, ll, ksl, vsl),
                    q, (kq, vq, kv_len, ksc, vsc), qbytes, args.calls, n)
            measure(f"kernel  int8 S={s_len}",
                    lambda qq, kk, vv, ll, ksl, vsl: decode_attention(
                        qq, kk, vv, ll, k_scale=ksl, v_scale=vsl),
                    q, (kq, vq, kv_len, ksc, vsc), qbytes, args.calls, n)
        # half-valid: the kernel's DMA skip should halve its time; the
        # einsum path reads the full S regardless
        half = jnp.full((b,), s_len // 2, jnp.int32)
        measure(f"einsum  bf16 S={s_len} half-valid", einsum_path, q,
                (k, v, half), cache_bytes, args.calls, n)
        measure(f"kernel  bf16 S={s_len} half-valid",
                lambda qq, kk, vv, ll: decode_attention(qq, kk, vv, ll),
                q, (k, v, half), cache_bytes, args.calls, n)


if __name__ == "__main__":
    main()
