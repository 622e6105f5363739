"""Text-only decoder example (reference example_lang.py equivalent).

Runs a KosmosLanguage forward on the available device (TPU chip if present)
and a short greedy generation, printing shapes + a checksum.
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp

from kosmosx_tpu.core.config import MagnetoConfig
from kosmosx_tpu.generate import SamplingConfig, generate_text
from kosmosx_tpu.models.language import KosmosLanguage


def main():
    t0 = time.time()
    print("devices:", jax.devices())
    # small-but-real config so the example runs in seconds
    cfg = MagnetoConfig(vocab_size=32002, embed_dim=512, ffn_dim=2048,
                        layers=6, heads=8, max_positions=2048,
                        compute_dtype="bfloat16", multiway=False,
                        dropout=0.0, attention_dropout=0.0)
    model = KosmosLanguage(config=cfg, seed=0)
    print(f"params: {model.num_params:,}")

    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 50), 4, 32002)
    logits = model(tokens)
    print("logits:", logits.shape, logits.dtype,
          "checksum:", float(jnp.sum(logits.astype(jnp.float32) ** 2)))

    out = generate_text(model.params, cfg, tokens,
                        SamplingConfig(max_new_tokens=16, greedy=True))
    print("generated:", out.shape, out[0].tolist())
    print(f"elapsed {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
