"""Multimodal Kosmos example (reference example.py equivalent).

Tokenizes a caption with KosmosTokenizer, preprocesses a synthetic image
device-side, runs the full CLIP -> resampler -> splice -> decoder forward,
and generates a continuation with the KV cache.
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

from kosmosx_tpu.core.config import (KosmosConfig, MagnetoConfig,
                                     ResamplerConfig, VisionConfig)
from kosmosx_tpu.data.tokenizer import KosmosTokenizer
from kosmosx_tpu.generate import SamplingConfig, generate_multimodal
from kosmosx_tpu.models.kosmos import Kosmos


def main():
    t0 = time.time()
    print("devices:", jax.devices())
    # scaled-down flagship (same architecture, fast to run)
    cfg = KosmosConfig(
        decoder=MagnetoConfig(vocab_size=32002, embed_dim=512, ffn_dim=2048,
                              layers=4, heads=8, max_positions=2048,
                              compute_dtype="bfloat16", multiway=True,
                              dropout=0.0, attention_dropout=0.0),
        vision=VisionConfig(hidden_dim=256, layers=4, heads=8, mlp_dim=1024,
                            compute_dtype="bfloat16"),
        resampler=ResamplerConfig(dim=256, depth=2, dim_head=32, heads=8,
                                  num_latents=64, num_media_embeds=257,
                                  compute_dtype="bfloat16"),
    )
    model = Kosmos(cfg, seed=0)
    print(f"params: {model.num_params:,}")

    tok = KosmosTokenizer(use_hf=False)  # byte fallback: zero egress
    sample = {
        "target_text": "An aerial photograph of a TPU datacenter.",
        "image": (np.random.RandomState(0)
                  .randint(0, 256, (1, 3, 256, 256)).astype(np.uint8)),
    }
    batch = tok.tokenize(sample)
    print("text_tokens:", batch["text_tokens"].shape,
          "images:", batch["images"].shape,
          "mask:", batch["attention_mask"].shape)

    logits = model(jnp.asarray(batch["text_tokens"]), batch["images"])
    print("logits:", logits.shape, logits.dtype,
          "checksum:", float(jnp.sum(logits.astype(jnp.float32) ** 2)))

    out = generate_multimodal(model.params, cfg,
                              jnp.asarray(batch["text_tokens"]),
                              batch["images"],
                              SamplingConfig(max_new_tokens=12, greedy=True))
    print("generated ids:", out[0].tolist())
    print("decoded:", repr(tok.decode(out[0])))
    print(f"elapsed {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
