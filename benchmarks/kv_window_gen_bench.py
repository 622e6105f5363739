"""Rolling-window decode throughput at long generation (TPU_QUEUE row 9).

StreamingLLM-style kv_window keeps the decode cache read FLAT however long
the generation runs: the cache holds kv_window positions (kv_sink pinned +
ring), so a 4k/8k-token generation pays window-sized attention reads every
step instead of an ever-growing cache. This probe times the flagship
decoder's jitted generate loop at N new tokens with kv_window=W vs the full
append-only cache, batch 8.

The reference has no generation loop at all (SURVEY.md §1); its xPos +
2048-entry position table could not reach these lengths (defect §2.6.3) —
the windowed path here generates past the table AND past the xPos numeric
range (nn/xpos re-centering, round-3 commit 06a5b18).

Usage: python benchmarks/kv_window_gen_bench.py [--new 4096] [--window 2048]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--new", type=int, default=4096)
    ap.add_argument("--window", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--prompt", type=int, default=128)
    ap.add_argument("--skip-full", action="store_true")
    args = ap.parse_args()

    from kosmosx_tpu.utils.platform import honor_jax_platforms
    honor_jax_platforms()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from kosmosx_tpu.core.config import MagnetoConfig
    from kosmosx_tpu.core.dtypes import init_casted
    from kosmosx_tpu.generate import SamplingConfig, generate_text
    from kosmosx_tpu.nn import decoder as dec

    base = MagnetoConfig(compute_dtype="bfloat16", scan_layers=True,
                         dropout=0.0, attention_dropout=0.0,
                         use_flash_attention=True, max_positions=8194)
    print(f"devices: {jax.devices()}", flush=True)
    params = init_casted(lambda k: dec.init_decoder(k, base),
                         jax.random.PRNGKey(0), base.dtype)
    prompt = jax.random.randint(jax.random.PRNGKey(1),
                                (args.batch, args.prompt), 4,
                                base.vocab_size, jnp.int32)

    def run(label, cfg):
        s = SamplingConfig(max_new_tokens=args.new, greedy=True)
        out = generate_text(params, cfg, prompt, s)       # compile + run
        float(jnp.sum(out))
        t0 = time.perf_counter()
        out = generate_text(params, cfg, prompt + 1, s)   # distinct input
        float(jnp.sum(out))
        dt = time.perf_counter() - t0
        tps = args.batch * args.new / dt
        print(f"{label}: {dt:.2f}s = {tps:,.0f} tok/s "
              f"({dt / args.new * 1e3:.2f} ms/step avg)", flush=True)
        return tps

    wcfg = dataclasses.replace(base, kv_window=args.window, kv_sink=4)
    w_tps = run(f"kv_window={args.window}, {args.new} new tokens", wcfg)
    if not args.skip_full:
        f_tps = run(f"full cache, {args.new} new tokens", base)
        print(f"window speedup at {args.new} new tokens: "
              f"{w_tps / f_tps:.2f}x", flush=True)


if __name__ == "__main__":
    main()
