"""Vision-tower (CLIP ViT-L/14 + resampler) throughput probe.

BASELINE.md: CLIP+resampler 33.6 ms @ batch 4 — ~15x the tower's ~2.2 ms
FLOP floor. Candidate culprit: seq 257 barely clears the flash kernel's
min length, so attention runs the Pallas kernel padded 257->384 with tiny
tiles, where XLA's fused attention should win. Measures encode_images with
flash on vs off (sequential distinct-input timed calls, scalar fetch).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from kosmosx_tpu.core.config import (KosmosConfig, MagnetoConfig,
                                     ResamplerConfig, VisionConfig)
from kosmosx_tpu.core.dtypes import init_casted
from kosmosx_tpu.models.kosmos import Kosmos

BATCH = 6
CALLS = 4


def measure(use_flash, params, base_cfg):
    import dataclasses

    cfg = dataclasses.replace(
        base_cfg, vision=dataclasses.replace(base_cfg.vision,
                                             use_flash_attention=use_flash))
    fn = jax.jit(lambda p, im: jnp.sum(
        Kosmos.encode_images(p, im, cfg).astype(jnp.float32)))
    key = jax.random.PRNGKey(1)
    imgs = [jax.random.normal(jax.random.fold_in(key, i),
                              (BATCH, 3, 224, 224), jnp.float32)
            for i in range(CALLS + 1)]
    for im in imgs:
        float(jnp.sum(im))
    float(fn(params, imgs[-1]))  # compile
    times = []
    for i in range(CALLS):
        t0 = time.perf_counter()
        float(fn(params, imgs[i]))
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"flash={use_flash}: {best * 1e3:.1f} ms/call (batch {BATCH}) "
          f"({[f'{t * 1e3:.0f}' for t in times]})", flush=True)
    return best


def main():
    print("devices:", jax.devices(), flush=True)
    cfg = KosmosConfig(
        decoder=MagnetoConfig(compute_dtype="bfloat16", scan_layers=True,
                              max_positions=8194),
        vision=VisionConfig(compute_dtype="bfloat16"),
        resampler=ResamplerConfig(compute_dtype="bfloat16"))
    params = init_casted(lambda k: Kosmos.init(k, cfg),
                         jax.random.PRNGKey(0), cfg.dtype)
    t_on = measure(True, params, cfg)
    t_off = measure(False, params, cfg)
    print(f"flash-off speedup: {t_on / t_off:.2f}x", flush=True)


def measure_chained(use_flash, params, base_cfg, iters=12):
    """Chained inside ONE jit: removes the per-call tunnel RTT that
    dominates single-call timings of sub-30ms workloads."""
    import dataclasses

    from jax import lax

    cfg = dataclasses.replace(
        base_cfg, vision=dataclasses.replace(base_cfg.vision,
                                             use_flash_attention=use_flash))

    @jax.jit
    def chained(p, im):
        def body(c, _):
            out = Kosmos.encode_images(p, c, cfg)  # (B, 64, D)
            bump = jnp.sum(out.astype(jnp.float32)) * 1e-9
            return (c + bump).astype(c.dtype), ()
        c, _ = lax.scan(body, im, None, length=iters)
        return jnp.sum(c.astype(jnp.float32))

    key = jax.random.PRNGKey(2)
    im0 = jax.random.normal(key, (BATCH, 3, 224, 224), jnp.float32)
    float(chained(params, im0))
    best = float("inf")
    for r in range(3):
        imr = im0 + 1e-4 * (r + 1)
        t0 = time.perf_counter()
        float(chained(params, imr))
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"chained flash={use_flash}: {best * 1e3:.2f} ms/iter "
          f"(batch {BATCH})", flush=True)
    return best


def main_chained():
    print("devices:", jax.devices(), flush=True)
    cfg = KosmosConfig(
        decoder=MagnetoConfig(compute_dtype="bfloat16", scan_layers=True,
                              max_positions=8194),
        vision=VisionConfig(compute_dtype="bfloat16"),
        resampler=ResamplerConfig(compute_dtype="bfloat16"))
    params = init_casted(lambda k: Kosmos.init(k, cfg),
                         jax.random.PRNGKey(0), cfg.dtype)
    measure_chained(True, params, cfg)
    measure_chained(False, params, cfg)


if __name__ == "__main__":
    if "--chained" in sys.argv:
        main_chained()
    else:
        main()
