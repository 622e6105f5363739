"""Continuous-batching serving demo on the real chip.

Builds a small Magneto decoder, starts a ServeEngine with 4 slots, submits
6 staggered requests (so slot reuse + mid-flight admission happen), and
prints each request's generated ids plus aggregate decode throughput.

Run: python examples/serve_demo.py [dim] [layers]
"""

import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from kosmosx_tpu.core.config import MagnetoConfig
from kosmosx_tpu.generate import SamplingConfig
from kosmosx_tpu.nn import decoder as dec
from kosmosx_tpu.serve import ServeConfig, ServeEngine


def main(dim=512, layers=4):
    cfg = MagnetoConfig(vocab_size=32002, embed_dim=dim, ffn_dim=4 * dim,
                        layers=layers, heads=8, max_positions=512,
                        compute_dtype="bfloat16", scan_layers=True,
                        dropout=0.0, attention_dropout=0.0)
    params = dec.init_decoder(jax.random.PRNGKey(0), cfg)
    # sync_lag pipelines host token reads behind compute; decode_block runs
    # 4 decode steps per device dispatch (see docs/performance-guide.md)
    eng = ServeEngine(params, cfg,
                      ServeConfig(max_batch=4, max_prompt_len=32,
                                  max_len=128, sync_lag=2, decode_block=4),
                      SamplingConfig(greedy=True))

    rng = np.random.RandomState(1)
    handles = []
    for i in range(3):  # initial wave
        lp = 5 + 3 * i
        # host-side prompts (device scalars would cost one tunnel RTT each
        # at admission re-upload)
        prompt = rng.randint(4, cfg.vocab_size, size=lp).astype(np.int32)
        handles.append(eng.submit(prompt, max_new_tokens=24))
    t0 = time.perf_counter()
    for _ in range(8):
        eng.step()
    for i in range(3, 6):  # staggered wave while the first is in flight
        lp = 4 + 2 * i
        prompt = rng.randint(4, cfg.vocab_size, size=lp).astype(np.int32)
        handles.append(eng.submit(prompt, max_new_tokens=24))
    steps = eng.run() + 8
    dt = time.perf_counter() - t0
    total = sum(len(h.tokens) for h in handles)
    for h in handles:
        print(f"req {h.id}: {len(h.tokens)} tokens  {h.tokens[:8]}...")
    print(f"{total} tokens over {steps} engine steps in {dt:.2f}s "
          f"({total / dt:.0f} tok/s incl. per-step host sync)")
    assert all(h.done for h in handles)
    print("SERVE DEMO OK")


if __name__ == "__main__":
    a = [int(v) for v in _sys.argv[1:3]]
    main(*a)
