"""MoE decoder throughput on chip (nn/moe.py expert-parallel FFN, 1 chip).

Measures a Switch/GShard-class MoE decoder forward (24L / 2048d / E experts
of ffn 8192, top-2, capacity 1.25) against the FLOP-comparable dense
decoder, plus a dense decoder with the MoE's ACTIVE ffn width (top_k x 8192)
— the honest comparator: an ideal MoE matches the active-width dense model's
speed while holding E/top_k x more FFN capacity.

On one chip the expert axis is 1 (no all-to-all), so this isolates the
routing + dispatch-einsum overhead: what a user pays per token for the extra
capacity before any cross-chip communication.

Methodology: sequential distinct-input timed calls with a scalar fetch
(bench.py rules; identical executions are served from the tunnel cache and
``block_until_ready`` does not block). Params are init+cast fused in one jit
(fp32 init of the E-stacked experts would OOM the 16 GiB chip).

Usage: python benchmarks/moe_bench.py [--experts 4] [--batch 4] [--calls 4]
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
from kosmosx_tpu.nn import decoder as dec

SEQ = 2048


def make_cfg(moe_experts=0, ffn_dim=8192, top_k=2):
    return MagnetoConfig(compute_dtype="bfloat16", scan_layers=True,
                         dropout=0.0, attention_dropout=0.0,
                         use_flash_attention=True, max_positions=8194,
                         flash_block_q=1024, flash_block_kv=1024,
                         multiway=False, ffn_dim=ffn_dim,
                         moe_experts=moe_experts, moe_top_k=top_k)


def measure(label, cfg, batch, calls):
    fn = jax.jit(lambda p, t: jnp.sum(
        dec.decoder_forward(p, t, cfg).astype(jnp.float32)))
    params = init_casted(lambda k: dec.init_decoder(k, cfg),
                         jax.random.PRNGKey(0), cfg.dtype)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    key = jax.random.PRNGKey(1)
    toks = [jax.random.randint(jax.random.fold_in(key, i), (batch, SEQ), 4,
                               cfg.vocab_size, jnp.int32)
            for i in range(calls + 1)]
    for t in toks:
        float(jnp.sum(t))
    float(fn(params, toks[-1]))  # compile
    times = []
    for i in range(calls):
        t0 = time.perf_counter()
        float(fn(params, toks[i]))
        times.append(time.perf_counter() - t0)
    best = min(times)
    tps = batch * SEQ / best
    print(f"{label}: {best * 1e3:.1f} ms = {tps:,.0f} tok/s "
          f"({n_params / 1e9:.2f}B params; "
          f"{[f'{t * 1e3:.0f}' for t in times]})", flush=True)
    del params
    return best, tps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--experts", type=int, default=4)
    ap.add_argument("--top-k", type=int, default=2)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--calls", type=int, default=4)
    ap.add_argument("--skip-dense", action="store_true")
    args = ap.parse_args()

    print(f"devices: {jax.devices()}", flush=True)
    results = {}
    results["moe"] = measure(
        f"MoE E={args.experts} top{args.top_k} ffn8192 b{args.batch}",
        make_cfg(moe_experts=args.experts, top_k=args.top_k),
        args.batch, args.calls)
    if not args.skip_dense:
        results["dense_active"] = measure(
            f"dense ffn{8192 * args.top_k} (active-FLOP match) b{args.batch}",
            make_cfg(ffn_dim=8192 * args.top_k), args.batch, args.calls)
        results["dense_base"] = measure(
            f"dense ffn8192 b{args.batch}", make_cfg(), args.batch, args.calls)
        overhead = results["moe"][0] / results["dense_active"][0]
        print(f"MoE routing+dispatch overhead vs active-FLOP dense: "
              f"{overhead:.2f}x", flush=True)


if __name__ == "__main__":
    main()
