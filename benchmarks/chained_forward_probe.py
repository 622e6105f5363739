"""Can the bench amortize the ~26 ms tunnel RTT by chaining forwards?

bench.py times sequential full-model calls; each pays one axon-tunnel RTT
(~26 ms of a ~348 ms call, ~7.5%). Production inference runs steps
back-to-back with no host sync per step, so chaining N forwards inside ONE
jit via ``lax.scan`` is the honest production shape. Round 1 tried this and
OOMed — but it carried full logits; a SCALAR carry (sum of each step's
logits, which also defeats the tunnel's identical-execution cache and dead
-code elimination) keeps the per-step footprint at one forward.

Measures: sequential per-call best vs scan-chained per-step time on the
flagship Kosmos (CLIP + resampler + 24L decoder), batch 6, seq 2048.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from kosmosx_tpu.core.config import (KosmosConfig, MagnetoConfig,
                                     ResamplerConfig, VisionConfig)
from kosmosx_tpu.core.dtypes import init_casted
from kosmosx_tpu.models.kosmos import Kosmos

_ap = argparse.ArgumentParser()
_ap.add_argument("--batch", type=int, default=6)
_ap.add_argument("--chain", type=int, default=6)
_ap.add_argument("--chain-only", action="store_true",
                 help="skip the sequential A side (batch sweeps)")
_args = _ap.parse_args()

BATCH = _args.batch
TEXT_LEN = 1984
CHAIN = _args.chain
SEQ_CALLS = 4

CFG = KosmosConfig(
    decoder=MagnetoConfig(compute_dtype="bfloat16", scan_layers=True,
                          dropout=0.0, attention_dropout=0.0,
                          use_flash_attention=True, max_positions=8194,
                          flash_block_q=1024, flash_block_kv=1024),
    vision=VisionConfig(compute_dtype="bfloat16"),
    resampler=ResamplerConfig(compute_dtype="bfloat16"),
)


def main():
    print("devices:", jax.devices(), flush=True)
    params = init_casted(lambda k: Kosmos.init(k, CFG),
                         jax.random.PRNGKey(0), CFG.dtype)
    key = jax.random.PRNGKey(1)
    vocab = CFG.decoder.vocab_size
    imgs = jax.random.normal(jax.random.fold_in(key, 999),
                             (BATCH, 3, 224, 224), jnp.float32)

    seq_times = None
    if not _args.chain_only:
        # -- sequential (bench.py methodology) ----------------------------
        seq_fn = jax.jit(lambda p, t, im: jnp.sum(
            Kosmos.apply(p, t, im, CFG).astype(jnp.float32)))
        toks = [jax.random.randint(jax.random.fold_in(key, i),
                                   (BATCH, TEXT_LEN), 4, vocab, jnp.int32)
                for i in range(SEQ_CALLS + 1)]
        for t in toks:
            float(jnp.sum(t))
        float(seq_fn(params, toks[-1], imgs))  # compile
        seq_times = []
        for i in range(SEQ_CALLS):
            t0 = time.perf_counter()
            float(seq_fn(params, toks[i], imgs))
            seq_times.append(time.perf_counter() - t0)
        print(f"sequential: best {min(seq_times) * 1e3:.1f} ms/call "
              f"({[f'{t * 1e3:.0f}' for t in seq_times]})", flush=True)

    # -- scan-chained ------------------------------------------------------
    def chain(p, stack, im, c0):
        def body(c, t):
            # runtime-dependent zero: ties each step to the carry so the
            # tunnel cache / DCE can't skip any forward
            t = t + jnp.isnan(c).astype(jnp.int32)
            s = jnp.sum(Kosmos.apply(p, t, im, CFG).astype(jnp.float32))
            return c + s, ()
        return lax.scan(body, c0, stack)[0]

    chain_fn = jax.jit(chain)
    stacks = [
        jax.random.randint(jax.random.fold_in(key, 1000 + i),
                           (CHAIN, BATCH, TEXT_LEN), 4, vocab, jnp.int32)
        for i in range(3)
    ]
    for s in stacks:
        float(jnp.sum(s))
    float(chain_fn(params, stacks[-1], imgs, jnp.float32(0)))  # compile
    chain_times = []
    for i in range(2):
        t0 = time.perf_counter()
        float(chain_fn(params, stacks[i], imgs, jnp.float32(i)))
        chain_times.append((time.perf_counter() - t0) / CHAIN)
    print(f"scan-chain({CHAIN}): best {min(chain_times) * 1e3:.1f} ms/step "
          f"({[f'{t * 1e3:.0f}' for t in chain_times]})", flush=True)
    tok = BATCH * (TEXT_LEN + 64)
    seq_part = (f"sequential {tok / min(seq_times):,.0f}  "
                if seq_times else "")
    print(f"batch {BATCH} tokens/sec: {seq_part}"
          f"chained {tok / min(chain_times):,.0f}", flush=True)


if __name__ == "__main__":
    main()
