"""Benchmark: images+text tokens/sec/chip on the flagship Kosmos model.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, ...extras}

Methodology (axon-tunnel-safe, see .claude/skills/verify/SKILL.md):
``block_until_ready`` does not block and identical executions are cached, so
every timed call (a) gets DISTINCT token inputs pre-staged on device, and
(b) is synced by fetching a scalar reduction of the logits to host with
``float(...)`` — a real value fetch, which does block. Per-call tunnel RTT
is included in the measurement (conservative). An outer ``lax.scan`` chain
was tried first but the 2.9B-param flagship + 8-deep scan exceeds single-chip
HBM and multiplies remote-compile time, so sequential timed calls it is.

Workload = BASELINE.json config 4: batched bf16, one image + text at decoder
sequence length 2048 (1984 text tokens + 64 spliced image embeddings), on the
24L/2048d/32h multiway decoder with CLIP ViT-L/14 + resampler in the loop.

``vs_baseline``: ratio against a recorded naive-XLA implementation of the
same model (fp32, no Pallas flash attention, no layer scan — the "direct
translation" a torch port would produce; measured once on this chip and
cached in bench_baseline.json). The reference itself publishes no numbers
(BASELINE.md).
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench_baseline.json")

BATCH = 4
TEXT_LEN = 1984          # + 64 image embeddings = 2048 decoder positions
TIMED_CALLS = 6


def _build(cfg):
    import jax
    import jax.numpy as jnp

    from kosmosx_tpu.models.kosmos import Kosmos

    def probe(params, tokens, images):
        logits = Kosmos.apply(params, tokens, images, cfg)
        # scalar reduction over ALL logits: the float() fetch of this value
        # is the only reliable sync point on the axon tunnel, and reducing
        # every position keeps XLA from shrinking the final vocab projection
        # to one row (measured cost of the full reduction: ~2%)
        return jnp.sum(logits.astype(jnp.float32))

    return jax.jit(probe)


def _measure(cfg, label):
    import jax
    import jax.numpy as jnp

    from kosmosx_tpu.core.dtypes import init_casted
    from kosmosx_tpu.models.kosmos import Kosmos

    # fused init+cast: materializing fp32 then casting would exceed HBM
    params = init_casted(lambda k: Kosmos.init(k, cfg),
                         jax.random.PRNGKey(0), cfg.dtype)
    fn = _build(cfg)
    vocab = cfg.decoder.vocab_size
    key = jax.random.PRNGKey(1)
    # pre-stage distinct token inputs on device (distinct values per call so
    # the tunnel's identical-execution cache can never serve a timed call)
    tok_batches = [
        jax.random.randint(jax.random.fold_in(key, i), (BATCH, TEXT_LEN),
                           4, vocab, jnp.int32)
        for i in range(TIMED_CALLS + 1)
    ]
    imgs = jax.random.normal(jax.random.fold_in(key, 999),
                             (BATCH, 3, 224, 224), jnp.float32)
    for t in tok_batches:
        float(jnp.sum(t))  # force resident before timing
    # warmup/compile
    float(fn(params, tok_batches[-1], imgs))
    times = []
    for i in range(TIMED_CALLS):
        t0 = time.perf_counter()
        float(fn(params, tok_batches[i], imgs))
        times.append(time.perf_counter() - t0)
    best = min(times)
    tokens_per_call = BATCH * (TEXT_LEN + 64)
    tps = tokens_per_call / best
    prefill_ms = best * 1000.0
    print(f"# {label}: {tps:,.0f} tok/s  ({prefill_ms:.1f} ms / "
          f"{tokens_per_call}-token prefill; times={['%.3f' % t for t in times]})",
          file=sys.stderr)
    return tps, prefill_ms


def main():
    from kosmosx_tpu.core.config import (KosmosConfig, MagnetoConfig,
                                         ResamplerConfig, VisionConfig)

    # max_positions=8194: seq-8192-capable table per the reference's training
    # intent (its 2048-entry table would NaN past ~2046 tokens, SURVEY §2.6.3)
    main_cfg = KosmosConfig(
        decoder=MagnetoConfig(compute_dtype="bfloat16", scan_layers=True,
                              dropout=0.0, attention_dropout=0.0,
                              use_flash_attention=True, max_positions=8194,
                              flash_block_q=1024, flash_block_kv=1024),
        vision=VisionConfig(compute_dtype="bfloat16"),
        resampler=ResamplerConfig(compute_dtype="bfloat16"),
    )
    import jax

    global BATCH
    fell_back = False
    try:
        tps, prefill_ms = _measure(main_cfg, "kosmosx_tpu bf16+flash")
    except jax.errors.JaxRuntimeError as e:  # HBM quota / tunnel variance only
        print(f"# batch {BATCH} failed ({type(e).__name__}); retrying batch 2",
              file=sys.stderr)
        BATCH = 2
        fell_back = True
        tps, prefill_ms = _measure(main_cfg, "kosmosx_tpu bf16+flash b2")

    baseline_tps = None
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            baseline_tps = json.load(f).get("naive_tokens_per_sec")
    if baseline_tps is None or os.environ.get("BENCH_REMEASURE_BASELINE"):
        naive_cfg = KosmosConfig(
            decoder=MagnetoConfig(compute_dtype="float32", scan_layers=True,
                                  dropout=0.0, attention_dropout=0.0,
                                  use_flash_attention=False,
                                  max_positions=8194),
            vision=VisionConfig(compute_dtype="float32",
                                use_flash_attention=False),
            resampler=ResamplerConfig(compute_dtype="float32"),
        )
        try:
            baseline_tps, _ = _measure(naive_cfg, "naive fp32 no-flash")
            note = ("fp32, jnp attention, same model/shapes; "
                    "the direct-translation baseline")
        except Exception as e:  # e.g. OOM at fp32 on one chip
            print(f"# fp32 baseline failed ({e}); trying bf16 no-flash",
                  file=sys.stderr)
            naive_cfg = dataclasses.replace(
                naive_cfg,
                decoder=dataclasses.replace(naive_cfg.decoder,
                                            compute_dtype="bfloat16"),
                vision=dataclasses.replace(naive_cfg.vision,
                                           compute_dtype="bfloat16"),
                resampler=dataclasses.replace(naive_cfg.resampler,
                                              compute_dtype="bfloat16"))
            try:
                baseline_tps, _ = _measure(naive_cfg, "naive bf16 no-flash")
                note = "bf16, jnp attention (fp32 baseline OOMed)"
            except Exception as e2:
                print(f"# naive baseline failed: {e2}", file=sys.stderr)
                baseline_tps = None
                note = None
        if baseline_tps is not None:
            with open(BASELINE_FILE, "w") as f:
                json.dump({"naive_tokens_per_sec": baseline_tps,
                           "note": note}, f)

    result = {
        "metric": f"images+text tokens/sec/chip (24L/2048d multiway decoder, "
                  f"CLIP ViT-L/14 + resampler, bf16, seq 2048, batch {BATCH})",
        "value": round(tps, 1),
        # the cached naive baseline was measured at batch 4; after a
        # batch-2 fallback the ratio is not comparable — report null
        "vs_baseline": (round(tps / baseline_tps, 3)
                        if baseline_tps and not fell_back else None),
        "unit": "tokens/sec/chip",
        "prefill_ms_per_batch": round(prefill_ms, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
