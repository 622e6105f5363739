"""MXU shape study: is head_dim 64 really a 2x penalty? (VERDICT r1 weak #3)

BASELINE.md attributes the flash kernel's 2.43 ms/call floor to head_dim 64
halving MXU utilization in both QK^T (contraction K=64) and PV (output
N=64). Before building a packed kernel, measure the PRIMITIVE question with
FLOP-matched pairs:

  qk64 : einsum('bqd,bkd->bqk')  b=128, q=k=1024, d=64
  qk128: same                    b=64,  q=k=1024, d=128   (equal FLOPs)
  pv64 : einsum('bqk,bkd->bqd')  b=128, q=k=1024, d=64
  pv128: same                    b=64,  q=k=1024, d=128   (equal FLOPs)

If t(qk64) ~= 2*t(qk128): K=64 contractions waste half the MXU and an exact
head-packing could in principle win (except no exact packing exists for
attention: block-diagonal embedding quadruples the score area — 8x QK^T
FLOPs for 2 heads; garbage-column packing is exactly FLOP-neutral).
If t(qk64) ~= t(qk128): there is NO shape penalty (Mosaic/XLA packs 64-wide
contractions), the "shape floor" explanation is wrong, and the kernel's
remaining floor is per-tile overhead + HBM traffic.

Timing: chained lax.scan inside one jit, scalar fetch, perturbed inputs per
repeat (axon tunnel rules — see CLAUDE.md).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(step_fn, carry0, *, iters=48, repeats=3):
    @jax.jit
    def chained(carry):
        def body(c, _):
            return step_fn(c), ()
        c, _ = jax.lax.scan(body, carry, None, length=iters)
        return jax.tree_util.tree_map(
            lambda x: jnp.sum(x.astype(jnp.float32)), c)

    float(jax.tree_util.tree_leaves(chained(carry0))[0])  # compile+warm
    best = float("inf")
    for r in range(repeats):
        c = jax.tree_util.tree_map(
            lambda x: x + jnp.asarray(1e-6 * (r + 1), x.dtype), carry0)
        t0 = time.perf_counter()
        float(jax.tree_util.tree_leaves(chained(c))[0])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def bench_qk(b, d, q_len=1024, k_len=1024):
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (b, q_len, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, k_len, d),
                          jnp.bfloat16)

    def step(qc):
        s = jnp.einsum("bqd,bkd->bqk", qc, k,
                       preferred_element_type=jnp.float32)
        return (qc + s[..., :d].astype(jnp.bfloat16) * 1e-6).astype(jnp.bfloat16)

    t = timeit(step, q)
    flops = 2 * b * q_len * k_len * d
    return t, flops / t / 1e12


def bench_pv(b, d, q_len=1024, k_len=1024):
    key = jax.random.PRNGKey(2)
    p = jax.random.normal(key, (b, q_len, k_len), jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(key, 3), (b, k_len, d),
                          jnp.bfloat16)

    def step(pc):
        o = jnp.einsum("bqk,bkd->bqd", pc, v,
                       preferred_element_type=jnp.float32)
        return pc.at[..., :d].add(o.astype(jnp.bfloat16) * 1e-6)

    t = timeit(step, p)
    flops = 2 * b * q_len * k_len * d
    return t, flops / t / 1e12


def main():
    print("devices:", jax.devices(), flush=True)
    out = {}
    # FLOP-matched pairs: b*d constant
    for name, fn, b, d in [
        ("qk_d64_b128", bench_qk, 128, 64),
        ("qk_d128_b64", bench_qk, 64, 128),
        ("pv_d64_b128", bench_pv, 128, 64),
        ("pv_d128_b64", bench_pv, 64, 128),
        # also the N-packed emulation: PV at d=128 with SAME b (2x FLOPs):
        # if this takes the same TIME as pv_d64_b128, garbage-column packing
        # of two heads' V would be a free win
        ("pv_d128_b128", bench_pv, 128, 128),
        ("qk_d128_b128", bench_qk, 128, 128),
    ]:
        t, tf = fn(b, d)
        out[name] = {"ms": round(t * 1e3, 4), "tflops": round(tf, 2)}
        print(name, out[name], flush=True)

    r_qk = out["qk_d64_b128"]["ms"] / out["qk_d128_b64"]["ms"]
    r_pv = out["pv_d64_b128"]["ms"] / out["pv_d128_b64"]["ms"]
    print(json.dumps({"summary": out,
                      "qk64_vs_qk128_flopmatched_ratio": round(r_qk, 3),
                      "pv64_vs_pv128_flopmatched_ratio": round(r_pv, 3)},
                     indent=1), flush=True)


if __name__ == "__main__":
    main()
