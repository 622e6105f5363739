"""KV-cache decode throughput on the flagship (BASELINE.json config 5).

Measures autoregressive generation: one jitted prefill+`lax.scan` decode
(generate/sampler.py) on the 2.88B-param Kosmos at bf16. Decode is
HBM-bandwidth bound (every step reads all params), so tokens/sec/chip here
tracks achievable bandwidth utilization rather than MXU peak.

Run: python benchmarks/decode_bench.py [batch] [new_tokens]
Prints one JSON line {"metric": "decode tokens/sec/chip", ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(batch: int = 8, new_tokens: int = 128, prompt_len: int = 128,
         w8: bool = False, kv8: bool = False, fast_attn: bool = False,
         no_scan: bool = False, no_unroll: bool = False,
         force_unroll: bool = False):
    import jax
    import jax.numpy as jnp

    from kosmosx_tpu.core.config import (KosmosConfig, MagnetoConfig,
                                         ResamplerConfig, VisionConfig)
    from kosmosx_tpu.core.dtypes import init_casted
    from kosmosx_tpu.generate import SamplingConfig, generate_multimodal
    from kosmosx_tpu.models.kosmos import Kosmos

    cfg = KosmosConfig(
        decoder=MagnetoConfig(compute_dtype="bfloat16",
                              scan_layers=not no_scan,
                              dropout=0.0, attention_dropout=0.0,
                              max_positions=8194,
                              kv_cache_dtype="int8" if kv8 else None,
                              decode_attn_kernel=fast_attn,
                              decode_unroll=not no_unroll,
                              **({"decode_unroll_min_len": 1}
                                 if force_unroll else {})),
        vision=VisionConfig(compute_dtype="bfloat16"),
        resampler=ResamplerConfig(compute_dtype="bfloat16"))
    params = init_casted(lambda k: Kosmos.init(k, cfg),
                         jax.random.PRNGKey(0), cfg.dtype)
    if w8:
        from kosmosx_tpu.utils.quantize import quantize_params_w8
        params = jax.jit(quantize_params_w8)(params)
    scfg = SamplingConfig(max_new_tokens=new_tokens, greedy=True)
    imgs = jax.random.normal(jax.random.PRNGKey(9), (batch, 3, 224, 224),
                             jnp.float32)

    def run(seed):
        toks = jax.random.randint(jax.random.PRNGKey(seed),
                                  (batch, prompt_len), 4,
                                  cfg.decoder.vocab_size, jnp.int32)
        out = generate_multimodal(params, cfg, toks, imgs, scfg)
        return int(out[0, -1])  # host fetch = the only reliable sync

    run(0)  # compile
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        run(i + 1)
        times.append(time.perf_counter() - t0)
    best = min(times)
    tps = batch * new_tokens / best
    print(json.dumps({
        "metric": f"decode tokens/sec/chip (2.88B flagship, "
                  f"{'int8 weights' if w8 else 'bf16'}"
                  f"{', int8 kv-cache' if kv8 else ''}"
                  f"{', pallas decode-attn' if fast_attn else ''}"
                  f"{', unrolled layers' if no_scan else ''}"
                  f"{', scan decode' if no_unroll else ''}"
                  f"{', forced unroll' if force_unroll else ''}, batch "
                  f"{batch}, {new_tokens} new tokens, {prompt_len}+64 prefill)",
        "value": round(tps, 1),
        "unit": "tokens/sec/chip",
        "seconds_per_call": round(best, 3),
        "ms_per_token": round(best / new_tokens * 1000, 2),
    }))


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    b = int(args[0]) if len(args) > 0 else 8
    n = int(args[1]) if len(args) > 1 else 128
    pl = int(args[2]) if len(args) > 2 else 128
    main(b, n, pl, w8="--w8" in sys.argv, kv8="--kv8" in sys.argv,
         fast_attn="--fast-attn" in sys.argv, no_scan="--no-scan" in sys.argv,
         no_unroll="--no-unroll" in sys.argv,
         force_unroll="--force-unroll" in sys.argv)
