"""In-VMEM tile-rate study: the decisive head_dim-64 measurement.

The XLA-level einsum probes (mxu_shape_study.py) are HBM-bound and can't
answer whether a d=64 attention tile runs the MXU at half rate. This kernel
keeps everything in VMEM: each grid program does the stripped attention pair
(s = q k^T; o = s_bf16 v) on its own (1024, d) blocks — exactly the flash
kernel's matmul skeleton with softmax removed.

FLOP-matched comparison: d=64 with G programs vs d=128 with G/2 programs.
- equal times  => d=64 halves the MXU rate (shape floor REAL; head-packing
  can't fix it: exact block-diagonal packing multiplies score-area FLOPs
  4x per head pair, garbage-column packing is FLOP-neutral).
- d64 in half the time => no shape penalty; the flash floor is elsewhere.
"""

import json
import time

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L = 1024


def make_fn(d, g):
    def kernel(q_ref, k_ref, v_ref, o_ref):
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        s = lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
        o = lax.dot(s.astype(jnp.bfloat16), v,
                    preferred_element_type=jnp.float32)
        o_ref[0] = o.astype(o_ref.dtype)

    @jax.jit
    def run(q, k, v):
        return pl.pallas_call(
            kernel,
            grid=(g,),
            in_specs=[pl.BlockSpec((1, L, d), lambda i: (i, 0, 0))] * 3,
            out_specs=pl.BlockSpec((1, L, d), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((g, L, d), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(q, k, v)

    return run


def bench(d, g, iters=24, repeats=3):
    run = make_fn(d, g)
    key = jax.random.PRNGKey(d)
    q = jax.random.normal(key, (g, L, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(key, 1), (g, L, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(key, 2), (g, L, d), jnp.bfloat16)

    @jax.jit
    def chained(q):
        def body(qc, _):
            o = run(qc, k, v)
            return (qc + o * 1e-6).astype(jnp.bfloat16), ()
        qc, _ = lax.scan(body, q, None, length=iters)
        return jnp.sum(qc.astype(jnp.float32))

    float(chained(q))  # compile
    best = float("inf")
    for r in range(repeats):
        qq = q + jnp.asarray(1e-5 * (r + 1), jnp.bfloat16)
        t0 = time.perf_counter()
        float(chained(qq))
        best = min(best, (time.perf_counter() - t0) / iters)
    flops = 2 * 2 * g * L * L * d  # two matmuls, 2 FLOP/MAC
    return best, flops / best / 1e12


def main():
    print("devices:", jax.devices(), flush=True)
    out = {}
    for name, d, g in [
        ("tile_d64_g256", 64, 256),
        ("tile_d128_g128", 128, 128),   # FLOP-matched with the above
        ("tile_d128_g256", 128, 256),   # 2x FLOPs — rate reference
    ]:
        t, tf = bench(d, g)
        out[name] = {"ms": round(t * 1e3, 4), "tflops": round(tf, 2)}
        print(name, out[name], flush=True)
    ratio = out["tile_d64_g256"]["ms"] / out["tile_d128_g128"]["ms"]
    print(json.dumps({"summary": out,
                      "d64_vs_d128_flopmatched_time_ratio": round(ratio, 3),
                      "verdict": ("shape floor REAL (d=64 ~half rate)"
                                  if ratio > 1.6 else
                                  "no/partial shape penalty")}, indent=1),
          flush=True)


if __name__ == "__main__":
    main()
