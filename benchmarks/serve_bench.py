"""Continuous-batching serving benchmark (ServeEngine) on the real chip.

Measures, on the flagship 24L/2048d/32h multiway decoder (bf16):
- sustained decode throughput (tokens/sec) with all slots busy and
  mid-flight admission keeping the pool full;
- admission latency (one batch-1 prefill + slot insert) ≈ time-to-first-token.

The engine's per-step host sync (it must read the sampled token ids to
detect EOS/budget) is included — this is the honest serving number, vs
benchmarks/decode_bench.py's pure jitted-scan decode ceiling.

Run: python benchmarks/serve_bench.py [--slots 8] [--new-tokens 64]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--prompt-len", type=int, default=128)
    ap.add_argument("--new-tokens", type=int, default=64)
    ap.add_argument("--requests", type=int, default=16)
    ap.add_argument("--dim", type=int, default=2048)
    ap.add_argument("--layers", type=int, default=24)
    ap.add_argument("--w8", action="store_true")
    ap.add_argument("--kv8", action="store_true",
                    help="int8 KV cache (halves decode cache reads)")
    ap.add_argument("--sync-lag", type=int, default=0,
                    help="host token reads lag K decode steps (pipelines "
                         "the device->host RTT behind compute)")
    ap.add_argument("--drain-batch", type=int, default=1,
                    help="read back K steps' tokens in ONE batched "
                         "device_get (1 link RTT per K steps instead of "
                         "per step); EOS lags sync_lag+K steps")
    ap.add_argument("--async-drain", action="store_true",
                    help="(no-op since round 5: ServeConfig.async_drain "
                         "defaults True; kept so recorded command lines "
                         "keep reproducing)")
    ap.add_argument("--no-async-drain", action="store_true",
                    help="disable the async-drain reader thread "
                         "(ServeConfig.async_drain=False): token fetches "
                         "block the step loop instead of overlapping it")
    ap.add_argument("--no-eager-copy", action="store_true",
                    help="skip copy_to_host_async at dispatch (each async "
                         "copy is its own RPC on the tunnel)")
    ap.add_argument("--spec-gamma", type=int, default=0,
                    help="speculative serving: draft proposes K tokens per "
                         "engine step (needs --draft-layers)")
    ap.add_argument("--draft-layers", type=int, default=4)
    ap.add_argument("--decode-block", type=int, default=0,
                    help="K decode steps per device dispatch (on-device "
                         "scan; amortizes dispatch overhead)")
    ap.add_argument("--prefill-chunk", type=int, default=0,
                    help="stream prompts in K-token chunks interleaved "
                         "with decode (bounds admission stall)")
    ap.add_argument("--multimodal", action="store_true",
                    help="image+text requests through the full Kosmos "
                         "flagship (CLIP + resampler at admission)")
    ap.add_argument("--prefix-len", type=int, default=0,
                    help="register a shared prefix of this many tokens; "
                         "every request's prompt starts with it, so "
                         "admission prefills only prompt_len - prefix_len "
                         "tokens (ServeEngine.register_prefix)")
    ap.add_argument("--adapter-rank", type=int, default=0,
                    help="multi-LoRA serving overhead: load a rank-R ZERO "
                         "adapter and submit every request through it — "
                         "outputs match the base model, so this isolates "
                         "the per-slot factor-stack einsum cost vs the "
                         "plain row (expect ~neutral)")
    ap.add_argument("--moe-experts", type=int, default=0,
                    help="token-routed MoE FFN with E experts (top-2): "
                         "proves MoE composes with the KV-cache serving "
                         "path on chip (multiway off; ffn 8192/expert)")
    ap.add_argument("--unroll-min-len", type=int, default=None,
                    help="ServeConfig.unroll_min_len override: pool length "
                         "above which decode programs unstack into "
                         "per-layer buffers (None = inherit the model "
                         "default; big value = force the lax.scan path)")
    ap.add_argument("--max-len", type=int, default=0,
                    help="force a larger KV pool than the derived "
                         "prompt+new+overrun size (e.g. 2048 to measure "
                         "--kernel-fill in its low-fill long-pool regime)")
    ap.add_argument("--kernel-fill", type=float, default=0.0,
                    help="ServeConfig.decode_kernel_fill: route dispatches "
                         "whose mean pool fill is below this fraction "
                         "through the Pallas decode-attention kernel "
                         "(pools >= 1024 only)")
    ap.add_argument("--fast-attn", action="store_true",
                    help="decode_attn_kernel=True: Pallas single-query "
                         "cache attention (ops/decode_attention.py)")
    ap.add_argument("--kv-window", type=int, default=0,
                    help="rolling KV window (StreamingLLM sinks + ring): "
                         "slot caches hold kv_window positions however "
                         "long the generation runs")
    ap.add_argument("--segment-every", type=int, default=0,
                    help="print a per-N-step wall-time segment line to "
                         "stderr (diagnoses mid-run anomalies — tunnel "
                         "stalls, stray compiles — that a single end-to-end "
                         "average hides)")
    ap.add_argument("--share-prefix", action="store_true",
                    help="with --prefix-len: shared-prefix ATTENTION "
                         "(share=True) — one broadcast KV segment, no "
                         "per-slot prefix copies, per-slot cache sized for "
                         "the remainder only")
    args = ap.parse_args(argv)
    # library default is async ON; --no-async-drain opts out
    args.async_drain = not args.no_async_drain
    if args.prefix_len >= args.prompt_len:
        raise SystemExit("--prefix-len must be < --prompt-len")
    if args.adapter_rank and (args.multimodal or args.prefix_len):
        raise SystemExit("--adapter-rank is text-only and skips prefix "
                         "caches (serve/config.py matrix)")

    from kosmosx_tpu.utils.platform import honor_jax_platforms
    honor_jax_platforms()  # JAX_PLATFORMS=cpu works for local smoke runs

    import jax
    import jax.numpy as jnp

    from kosmosx_tpu.core.config import MagnetoConfig
    from kosmosx_tpu.core.dtypes import init_casted
    from kosmosx_tpu.generate import SamplingConfig
    from kosmosx_tpu.nn import decoder as dec
    from kosmosx_tpu.serve import ServeConfig, ServeEngine

    cfg = MagnetoConfig(embed_dim=args.dim, ffn_dim=4 * args.dim,
                        layers=args.layers, heads=args.dim // 64,
                        max_positions=8194, compute_dtype="bfloat16",
                        scan_layers=True, dropout=0.0, attention_dropout=0.0,
                        kv_cache_dtype="int8" if args.kv8 else None,
                        kv_window=args.kv_window,
                        decode_attn_kernel=args.fast_attn,
                        moe_experts=args.moe_experts,
                        multiway=args.moe_experts == 0)
    kcfg = None
    if args.multimodal:
        from kosmosx_tpu.core.config import (KosmosConfig, ResamplerConfig,
                                             VisionConfig)
        from kosmosx_tpu.models.kosmos import Kosmos

        kcfg = KosmosConfig(decoder=cfg,
                            vision=VisionConfig(compute_dtype="bfloat16"),
                            resampler=ResamplerConfig(
                                compute_dtype="bfloat16"))
        params = init_casted(lambda k: Kosmos.init(k, kcfg),
                             jax.random.PRNGKey(0), cfg.dtype)
    else:
        params = init_casted(lambda k: dec.init_decoder(k, cfg),
                             jax.random.PRNGKey(0), cfg.dtype)
    if args.w8:
        from kosmosx_tpu.utils.quantize import quantize_params_w8
        params = jax.jit(quantize_params_w8)(params)

    draft_params = draft_cfg = None
    if args.spec_gamma > 0:
        import dataclasses
        draft_cfg = dataclasses.replace(cfg, layers=args.draft_layers)
        draft_params = init_casted(lambda k: dec.init_decoder(k, draft_cfg),
                                   jax.random.PRNGKey(7), cfg.dtype)
    extra = kcfg.image_embed_len if kcfg is not None else 0
    window_cfg = ServeConfig(sync_lag=args.sync_lag,
                             drain_batch=args.drain_batch,
                             async_drain=args.async_drain,
                             eager_copy=not args.no_eager_copy,
                             spec_gamma=args.spec_gamma,
                             decode_block=args.decode_block)
    # shared-prefix attention keeps the prefix OUT of per-slot caches
    own_prompt = (args.prompt_len - args.prefix_len
                  if args.share_prefix else args.prompt_len)
    max_len = (own_prompt + extra + args.new_tokens
               + window_cfg.overrun_window)
    if args.kv_window:
        # ring pool: cache sized at the window regardless of budgets
        max_len = max(args.kv_window, args.prompt_len)
    if args.max_len:
        # explicit pool override — e.g. a LONG low-fill pool, the
        # decode_kernel_fill regime (short requests never reach the far
        # end; the kernel's DMA skip avoids reading it)
        max_len = max(max_len, args.max_len)
    eng = ServeEngine(params, cfg,
                      ServeConfig(max_batch=args.slots,
                                  max_prompt_len=args.prompt_len,
                                  max_len=max_len,
                                  sync_lag=args.sync_lag,
                                  drain_batch=args.drain_batch,
                                  async_drain=args.async_drain,
                                  eager_copy=not args.no_eager_copy,
                                  spec_gamma=args.spec_gamma,
                                  decode_block=args.decode_block,
                                  prefill_chunk=args.prefill_chunk,
                                  unroll_min_len=args.unroll_min_len,
                                  decode_kernel_fill=args.kernel_fill),
                      SamplingConfig(greedy=True),
                      kosmos_cfg=kcfg,
                      draft_params=draft_params, draft_cfg=draft_cfg)

    adapter_name = None
    if args.adapter_rank > 0:
        # a ZERO adapter (b factors zero) leaves outputs bit-identical to
        # the base model; what this measures is the decode-path cost of the
        # per-slot factor stacks (two thin batched einsums per adapted
        # linear) relative to the plain row
        from kosmosx_tpu.train.lora import add_lora, strip_lora
        tree = strip_lora(add_lora(jax.random.PRNGKey(3), params,
                                   rank=args.adapter_rank))[1]
        tree = jax.tree_util.tree_map(
            lambda x: x.astype(cfg.dtype) if hasattr(x, "astype") else x,
            tree)
        eng.load_adapter("bench", tree)
        adapter_name = "bench"

    import numpy as np
    rng = np.random.RandomState(1)
    shared_prefix = (rng.randint(4, cfg.vocab_size, size=args.prefix_len)
                     .astype(np.int32) if args.prefix_len else None)
    if shared_prefix is not None:
        eng.register_prefix(shared_prefix, share=args.share_prefix)

    def mk_prompt(i):
        # host-side prompts: a list of DEVICE scalars here would cost one
        # tunnel RTT per token when the engine re-uploads them (measured
        # 3.4 s per 128-token admission)
        p = rng.randint(4, cfg.vocab_size,
                        size=args.prompt_len).astype(np.int32)
        if shared_prefix is not None:
            p[:args.prefix_len] = shared_prefix
        return p

    def mk_images(i):
        if kcfg is None:
            return None
        return rng.rand(1, 3, kcfg.vision.image_size,
                        kcfg.vision.image_size).astype(np.float32)

    # deploy-style warmup: compiles the batch-1 AND batched-admission
    # prefill programs (plus prefix/adapter flavors) before any timed
    # traffic — a mid-run compile of the batched program costs ~30 s+ on
    # the tunnel and wrecks the row (observed)
    t_w = time.perf_counter()
    eng.warmup(adapters=adapter_name is not None)
    print(f"# warmup: {time.perf_counter() - t_w:.1f}s", file=sys.stderr)

    handles = []
    # admission latency: first prefill (compile) then a timed one
    handles.append(eng.submit(mk_prompt(0), max_new_tokens=args.new_tokens,
                              images=mk_images(0), adapter=adapter_name))
    eng.step()  # compiles prefill+decode programs
    t0 = time.perf_counter()
    handles.append(eng.submit(mk_prompt(1), max_new_tokens=args.new_tokens,
                              images=mk_images(1), adapter=adapter_name))
    eng.step()
    admit_s = time.perf_counter() - t0

    # fill the pool and keep it full; measure steady-state decode
    pending = [(mk_prompt(i), mk_images(i))
               for i in range(2, args.requests)]
    while len(handles) < args.slots and pending:
        p, im = pending.pop()
        handles.append(eng.submit(p, max_new_tokens=args.new_tokens,
                                  images=im))
    t0 = time.perf_counter()
    tokens_before = 0
    steps = 0
    seg_t0 = time.perf_counter()
    while True:
        alive = eng.step()
        steps += 1
        if args.segment_every and steps % args.segment_every == 0:
            now = time.perf_counter()
            print(f"# steps {steps - args.segment_every + 1}-{steps}: "
                  f"{(now - seg_t0) / args.segment_every * 1e3:.1f} ms/step",
                  file=sys.stderr, flush=True)
            seg_t0 = now
        if steps == 4:  # let the pool warm up before counting
            tokens_before = _total_tokens(handles)
            t0 = time.perf_counter()
            # steady-state anatomy: drop warmup/compile phases from the
            # per-phase counters and reader fetch stats (both printed
            # diagnostics then cover the same counted-step range)
            eng.reset_counters()
            steps_before = steps
        while pending and eng.num_active < args.slots:
            p, im = pending.pop()
            handles.append(eng.submit(p, max_new_tokens=args.new_tokens,
                                      images=im, adapter=adapter_name))
            # just-admitted requests still need decode steps — don't break
            # on the pre-admission ``alive`` (lockstep completions would
            # otherwise drop the final wave's tokens)
            alive = True
        if not alive and not pending:
            break
    dt = time.perf_counter() - t0
    total = _total_tokens(handles) - tokens_before
    tps = total / dt
    print(f"# serve: {total} tokens in {dt:.2f}s over {steps} steps; "
          f"admission {admit_s * 1000:.1f} ms", file=sys.stderr)
    # host-loop anatomy (cumulative per-phase wall time / step count):
    # attributes each ms of a serving step to admit / prep / fold /
    # dispatch-enqueue / post / drain — the serving loop is host-sensitive
    # on a remote chip, so slow rows need attribution, not guesses
    n_anat = max(steps - locals().get("steps_before", 0), 1)
    anat = {k: round(v / n_anat * 1e3, 2) for k, v in eng.phase_s.items()}
    anat["total"] = round(sum(eng.phase_s.values()) / n_anat * 1e3, 2)
    print(f"# anatomy ms/step (over {n_anat} steady-state steps): {anat}",
          file=sys.stderr)
    rs = getattr(eng, "_reader_stats", None)
    if rs and rs["n"]:
        print(f"# reader: {rs['n']} fetches, mean "
              f"{rs['s'] / rs['n'] * 1e3:.2f} ms", file=sys.stderr)
    if args.spec_gamma:
        g = args.spec_gamma
        acc = (eng.accepted_total / max(eng.emitted_total, 1))
        rounds_per_sec = steps / dt
        print(f"# speculative: acceptance/token {acc:.3f}, "
              f"{rounds_per_sec:.1f} rounds/s -> projected "
              f"{(0.7 * g + 1) * rounds_per_sec * args.slots:.0f} tok/s "
              f"at 70% trained-draft acceptance", file=sys.stderr)
    print(json.dumps({
        "metric": f"serving decode tokens/sec ({args.layers}L/{args.dim}d "
                  f"{'multiway ' if args.moe_experts == 0 else ''}decoder"
                  f"{' + CLIP ViT-L/14 + resampler' if kcfg else ''}, "
                  f"bf16, {args.slots} slots, "
                  f"continuous batching{', w8' if args.w8 else ''}"
                  f"{', kv8' if args.kv8 else ''}"
                  f"{f', sync_lag={args.sync_lag}' if args.sync_lag else ''}"
                  f"{f', drain_batch={args.drain_batch}' if args.drain_batch > 1 else ''}"
                  f"{', no_async_drain' if not args.async_drain else ''}"
                  f"{', no_eager_copy' if args.no_eager_copy else ''}"
                  f"{f', spec_gamma={args.spec_gamma}' if args.spec_gamma else ''}"
                  f"{f', prefill_chunk={args.prefill_chunk}' if args.prefill_chunk else ''}"
                  f"{f', decode_block={args.decode_block}' if args.decode_block else ''}"
                  f"{f', prefix_len={args.prefix_len}' if args.prefix_len else ''}"
                  f"{', SHARED-prefix attention' if args.share_prefix else ''}"
                  f"{f', kv_window={args.kv_window}' if args.kv_window else ''}"
                  f"{f', rank-{args.adapter_rank} adapter on every slot' if args.adapter_rank else ''}"
                  f"{f', MoE E={args.moe_experts} top2' if args.moe_experts else ''})",
        "value": round(tps, 1),
        "unit": "tokens/sec/chip",
        "admission_ms": round(admit_s * 1000, 1),
        **({"rounds_per_sec": round(steps / dt, 2),
            "acceptance": round(eng.accepted_total
                                / max(eng.emitted_total, 1), 4)}
           if args.spec_gamma else {}),
    }))


def _total_tokens(handles) -> int:
    return sum(len(h.tokens) for h in handles)


if __name__ == "__main__":
    main()
