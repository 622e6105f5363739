"""Decoder-forward anatomy: where do the non-matmul 108 ms go?

BASELINE.md: flagship decoder forward 245.8 ms at batch 4 vs a 137.5 ms
pure-matmul proxy of its own shapes. The flash kernel accounts for ~73 ms,
so ~100+ ms is LN / elementwise / residual HBM traffic. This probe measures
each contributor with WRONG-MATH ablations (monkeypatched identities) —
the numbers size the prize for LN-fusion work, nothing else.

Methodology: sequential distinct-input timed calls with scalar fetch
(bench.py rules; chained scans exceed HBM on the 2.88B flagship).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from kosmosx_tpu.core.config import MagnetoConfig
from kosmosx_tpu.core.dtypes import init_casted
from kosmosx_tpu.nn import decoder as dec
from kosmosx_tpu.nn import layers

BATCH = 6
SEQ = 2048
CALLS = 4

CFG = MagnetoConfig(compute_dtype="bfloat16", scan_layers=True,
                    dropout=0.0, attention_dropout=0.0,
                    use_flash_attention=True, max_positions=8194,
                    flash_block_q=1024, flash_block_kv=1024)


def measure(label):
    fn = jax.jit(lambda p, t: jnp.sum(
        dec.decoder_forward(p, t, CFG).astype(jnp.float32)))
    params = init_casted(lambda k: dec.init_decoder(k, CFG),
                         jax.random.PRNGKey(0), CFG.dtype)
    key = jax.random.PRNGKey(1)
    toks = [jax.random.randint(jax.random.fold_in(key, i), (BATCH, SEQ), 4,
                               CFG.vocab_size, jnp.int32)
            for i in range(CALLS + 1)]
    for t in toks:
        float(jnp.sum(t))
    float(fn(params, toks[-1]))  # compile
    times = []
    for i in range(CALLS):
        t0 = time.perf_counter()
        float(fn(params, toks[i]))
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"{label}: {best * 1e3:.1f} ms  "
          f"({[f'{t * 1e3:.0f}' for t in times]})", flush=True)
    del params
    return best


def main():
    print("devices:", jax.devices(), flush=True)
    real_ln = layers.layer_norm
    real_act = layers.activation_fn

    t_real = measure("real")

    layers.layer_norm = lambda p, x, eps=1e-5: x
    t_noln = measure("no_layer_norms (wrong math)")
    layers.layer_norm = real_ln

    layers.activation_fn = lambda name: (lambda x: x)
    t_noact = measure("no_activation (wrong math)")
    layers.activation_fn = real_act

    layers.layer_norm = lambda p, x, eps=1e-5: x
    layers.activation_fn = lambda name: (lambda x: x)
    t_neither = measure("no_ln_no_act (wrong math)")
    layers.layer_norm = real_ln
    layers.activation_fn = real_act

    print(f"LN cost: {(t_real - t_noln) * 1e3:.1f} ms  "
          f"activation cost: {(t_real - t_noact) * 1e3:.1f} ms  "
          f"combined: {(t_real - t_neither) * 1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
