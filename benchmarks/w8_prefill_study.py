"""W8 at prefill/training M (VERDICT r1 weak #9).

The round-1 study evaluated the Pallas W8 kernels only at decode's tiny M
(M=8..32), where XLA's dequant-fused matmul won and the kernels ship
default-off. This measures the OTHER regime: prefill/training M (the
flagship FFN at batch 6 x seq 2048 => M=12288), K=2048, N=8192, where the
matmul is compute-bound and the question is whether int8 weights buy
anything at all.

Variants (FLOP-identical): bf16 matmul; XLA dequant (codes->bf16 * scale,
fused); Pallas w8_matmul. Chained-scan timing, scalar fetch.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from kosmosx_tpu.ops.quant_matmul import w8_matmul, w8_matmul_reference

M, K, N = 12288, 2048, 8192


def timeit(fn, x0, iters=16, repeats=3):
    @jax.jit
    def chained(x):
        def body(c, _):
            o = fn(c)
            # fold a slice of the (M, N) output back into the (M, K) carry
            return (c + o[:, :K] * 1e-6).astype(jnp.bfloat16), ()
        c, _ = lax.scan(body, x, None, length=iters)
        return jnp.sum(c.astype(jnp.float32))

    float(chained(x0))
    best = float("inf")
    for r in range(repeats):
        xx = x0 + jnp.asarray(1e-5 * (r + 1), jnp.bfloat16)
        t0 = time.perf_counter()
        float(chained(xx))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (M, K), jnp.bfloat16)
    w = jax.random.normal(jax.random.fold_in(key, 1), (K, N), jnp.bfloat16)
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0, keepdims=True)
    scale = (amax / 127.0).astype(jnp.float32)
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127,
                 127).astype(jnp.int8)

    out = {}
    flops = 2 * M * K * N
    for name, fn in [
        ("bf16", lambda c: c @ w),
        ("xla_dequant", lambda c: w8_matmul_reference(c, q, scale)),
        ("pallas_w8", lambda c: w8_matmul(c, q, scale, block_m=512,
                                          block_k=512, block_n=1024)),
    ]:
        t = timeit(fn, x)
        out[name] = {"ms": round(t * 1e3, 3),
                     "tflops": round(flops / t / 1e12, 1)}
        print(name, out[name], flush=True)
    print(json.dumps({"shape": [M, K, N], "summary": out}), flush=True)


if __name__ == "__main__":
    main()
