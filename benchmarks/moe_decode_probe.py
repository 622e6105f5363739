"""MoE decode throughput on chip: does the expert-parallel FFN compose with
the KV-cache decode path, and what does a token pay for it? (round-2 VERDICT
item 4, second half.)

Decode is weight-read bound (BASELINE.md: 911 tok/s dense at batch 8 = the
~345 GB/s HBM wall). The GShard-style dispatch einsum contracts every token
against EVERY expert's capacity buffer, so a dense-dispatch MoE decode step
reads all E experts' FFN weights per token — the E/top_k capacity advantage
costs E/1 weight bandwidth at decode. This probe measures that honestly on
one chip against the FLOP-comparable dense decoders (same comparators as
benchmarks/moe_bench.py).

Timing: jitted prefill + lax.scan decode (generate/sampler.generate_text),
host token fetch per call, distinct prompts per timed call (bench.py rules).

Usage: python benchmarks/moe_decode_probe.py [--experts 4] [--batch 8]
       [--new-tokens 128] [--prompt-len 128]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from kosmosx_tpu.core.config import MagnetoConfig
from kosmosx_tpu.core.dtypes import init_casted
from kosmosx_tpu.generate import SamplingConfig, generate_text
from kosmosx_tpu.nn import decoder as dec


def make_cfg(moe_experts=0, ffn_dim=8192, top_k=2):
    return MagnetoConfig(compute_dtype="bfloat16", scan_layers=True,
                         dropout=0.0, attention_dropout=0.0,
                         max_positions=8194, multiway=False,
                         ffn_dim=ffn_dim, moe_experts=moe_experts,
                         moe_top_k=top_k)


def measure(label, cfg, batch, prompt_len, new_tokens, calls=3):
    params = init_casted(lambda k: dec.init_decoder(k, cfg),
                         jax.random.PRNGKey(0), cfg.dtype)
    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    scfg = SamplingConfig(max_new_tokens=new_tokens, greedy=True)

    def run(seed):
        toks = jax.random.randint(jax.random.PRNGKey(seed),
                                  (batch, prompt_len), 4,
                                  cfg.vocab_size, jnp.int32)
        out = generate_text(params, cfg, toks, scfg)
        return int(out[0, -1])  # host fetch = the only reliable sync

    run(0)  # compile
    times = []
    for i in range(calls):
        t0 = time.perf_counter()
        run(i + 1)
        times.append(time.perf_counter() - t0)
    best = min(times)
    tps = batch * new_tokens / best
    print(f"{label}: {best:.3f} s = {tps:,.0f} tok/s "
          f"({n / 1e9:.2f}B params; "
          f"{[f'{t:.2f}' for t in times]})", flush=True)
    del params
    return tps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--experts", type=int, default=4)
    ap.add_argument("--top-k", type=int, default=2)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--new-tokens", type=int, default=128)
    ap.add_argument("--prompt-len", type=int, default=128)
    ap.add_argument("--skip-dense", action="store_true")
    args = ap.parse_args()

    print(f"devices: {jax.devices()}", flush=True)
    moe = measure(
        f"MoE E={args.experts} top{args.top_k} ffn8192 decode b{args.batch}",
        make_cfg(moe_experts=args.experts, top_k=args.top_k),
        args.batch, args.prompt_len, args.new_tokens)
    if not args.skip_dense:
        act = measure(
            f"dense ffn{8192 * args.top_k} (active-FLOP match) decode "
            f"b{args.batch}",
            make_cfg(ffn_dim=8192 * args.top_k),
            args.batch, args.prompt_len, args.new_tokens)
        base = measure(
            f"dense ffn8192 decode b{args.batch}", make_cfg(),
            args.batch, args.prompt_len, args.new_tokens)
        print(f"MoE decode vs active-FLOP dense: {moe / act:.2f}x; "
              f"vs base dense: {moe / base:.2f}x", flush=True)


if __name__ == "__main__":
    main()
