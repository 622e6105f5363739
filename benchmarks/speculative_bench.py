"""Speculative-decoding benchmark on the real chip.

Decode is weight-read-bound (BASELINE.md), so the speedup hypothesis rests
on one hardware fact: a (gamma+1)-token verify forward reads the weights
ONCE, i.e. costs about the same as a single-token decode step. This bench
measures that directly, then runs the end-to-end loop:

1. plain decode ms/token on the target (the baseline);
2. chunked verify ms for gamma+1 tokens (should be ~= one decode step);
3. end-to-end speculative_generate with a truncated-layer draft, reporting
   tokens/sec and the measured acceptance rate. NOTE: with random-init
   weights the draft's agreement with the target is chance-level, so the
   end-to-end number here exercises the mechanics; the realizable speedup
   is (accepted+1 per round) x the step-cost ratio, which materializes
   with trained weights (a trained shallow draft typically accepts 60-80%).

Run: python benchmarks/speculative_bench.py [--gamma 4] [--draft-layers 4]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--gamma", type=int, default=4)
    ap.add_argument("--dim", type=int, default=2048)
    ap.add_argument("--layers", type=int, default=24)
    ap.add_argument("--draft-layers", type=int, default=4)
    ap.add_argument("--prompt-len", type=int, default=128)
    ap.add_argument("--new-tokens", type=int, default=64)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from kosmosx_tpu.core.config import MagnetoConfig
    from kosmosx_tpu.core.dtypes import init_casted
    from kosmosx_tpu.generate import SamplingConfig, speculative_generate
    from kosmosx_tpu.generate.sampler import _prefill
    from kosmosx_tpu.generate.speculative import _decode_logits
    from kosmosx_tpu.nn import decoder as dec

    cfg = MagnetoConfig(embed_dim=args.dim, ffn_dim=4 * args.dim,
                        layers=args.layers, heads=args.dim // 64,
                        max_positions=8194, compute_dtype="bfloat16",
                        scan_layers=True, dropout=0.0, attention_dropout=0.0)
    dcfg = dataclasses.replace(cfg, layers=args.draft_layers)
    params = init_casted(lambda k: dec.init_decoder(k, cfg),
                         jax.random.PRNGKey(0), cfg.dtype)
    draft = init_casted(lambda k: dec.init_decoder(k, dcfg),
                        jax.random.PRNGKey(1), cfg.dtype)

    b, lp, g = args.batch, args.prompt_len, args.gamma
    max_len = lp + args.new_tokens + g + 2
    key = jax.random.PRNGKey(2)
    prompt = jax.random.randint(key, (b, lp), 4, cfg.vocab_size, jnp.int32)
    lengths = jnp.full((b,), lp, jnp.int32)

    # prefill once; then time single-token vs (gamma+1)-token cached steps,
    # chained REPS deep inside one jit (single calls sink under tunnel RTT)
    REPS = 16

    @jax.jit
    def chained_steps(params, caches, tok0):
        def body(c, _):
            tok, caches, idx = c
            logits, caches = _decode_logits(params, cfg, tok, caches, idx)
            nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
            return (jnp.broadcast_to(nxt[:, None],
                                     tok.shape).astype(jnp.int32),
                    caches, idx + tok.shape[1]), None
        (tok, caches, _), _ = jax.lax.scan(
            body, (tok0, caches, lengths), None, length=REPS)
        return jnp.sum(tok)

    def time_steps(chunk_len):
        caches = dec.init_cache(cfg, batch=b, max_len=max_len)
        seg = jnp.where(jnp.arange(lp)[None, :] < lengths[:, None], 0,
                        -1).astype(jnp.int32)
        last, caches = jax.jit(
            lambda p, c: _prefill(p, cfg,
                                  dec.forward_embedding(p, cfg, prompt)[0],
                                  c, lengths, seg))(params, caches)
        tok0 = jnp.argmax(last, -1).astype(jnp.int32)
        toks = jnp.broadcast_to(tok0[:, None], (b, chunk_len)).astype(jnp.int32)
        float(chained_steps(params, caches, toks))  # compile
        times = []
        for i in range(3):
            t2 = jnp.broadcast_to(((tok0 + i) % 1000)[:, None],
                                  (b, chunk_len)).astype(jnp.int32)
            t0 = time.perf_counter()
            float(chained_steps(params, caches, t2))
            times.append(time.perf_counter() - t0)
        return min(times) / REPS * 1000  # ms per step

    step1_ms = time_steps(1)
    stepg_ms = time_steps(g + 1)
    print(f"# single-token decode step: {step1_ms:.2f} ms; "
          f"{g + 1}-token verify step: {stepg_ms:.2f} ms "
          f"(x{stepg_ms / step1_ms:.2f})", file=sys.stderr)

    # end-to-end speculative (mechanics; acceptance is chance-level at
    # random init — see module docstring)
    scfg = SamplingConfig(max_new_tokens=args.new_tokens, greedy=True)
    out, stats = speculative_generate(params, draft, cfg, dcfg, prompt, scfg,
                                      gamma=g)  # compile
    t0 = time.perf_counter()
    out, stats = speculative_generate(params, draft, cfg, dcfg,
                                      jnp.where(prompt > 5, prompt - 1,
                                                prompt),
                                      scfg, gamma=g)
    dt = time.perf_counter() - t0
    total = b * args.new_tokens
    acc_rate = stats["accepted"] / max(stats["proposed"], 1)
    print(f"# speculative e2e: {total} tokens in {dt:.2f}s, "
          f"{stats['rounds']} rounds, acceptance {acc_rate:.3f}",
          file=sys.stderr)
    # realizable speedup with acceptance a: (a*gamma+1) tokens per round at
    # a cost of gamma draft steps (~layers-ratio of a target step) + 1 verify
    draft_ratio = args.draft_layers / args.layers
    projected = lambda a: ((a * g + 1)
                           / (g * draft_ratio + stepg_ms / step1_ms))
    print(json.dumps({
        "metric": f"speculative verify-step cost ratio (gamma={g}, "
                  f"{args.layers}L target, batch {b}, bf16)",
        "value": round(stepg_ms / step1_ms, 3),
        "unit": "x single-token step",
        "decode_step_ms": round(step1_ms, 2),
        "verify_step_ms": round(stepg_ms, 2),
        "e2e_tokens_per_sec": round(total / dt, 1),
        "acceptance_rate_random_init": round(acc_rate, 4),
        "projected_speedup_at_70pct_acceptance": round(projected(0.7), 2),
    }))


if __name__ == "__main__":
    main()
