"""Tour of the serving engine's production features on a tiny model.

Runs everywhere (CPU included) in ~a minute; swap the config for the
flagship on a TPU chip. Demonstrates, in one pool:

  1. continuous batching with mid-flight admission
  2. copy-mode prefix caching + shared-prefix attention (system prompts)
  3. multi-LoRA serving (per-request adapters over one base)
  4. per-request sampling (temperature / top-k / top-p)
  5. request cancellation
  6. warmup() precompilation
  7. engine stats

Usage: python examples/serving_tour.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kosmosx_tpu.utils.platform import honor_jax_platforms  # noqa: E402

honor_jax_platforms()

import jax  # noqa: E402

from kosmosx_tpu.core.config import MagnetoConfig  # noqa: E402
from kosmosx_tpu.generate import SamplingConfig  # noqa: E402
from kosmosx_tpu.nn import decoder as dec  # noqa: E402
from kosmosx_tpu.serve import ServeConfig, ServeEngine  # noqa: E402
from kosmosx_tpu.train.lora import add_lora, strip_lora  # noqa: E402


def main():
    cfg = MagnetoConfig(vocab_size=211, embed_dim=64, ffn_dim=128, layers=2,
                        heads=4, max_positions=128,
                        use_flash_attention=False, multiway=False,
                        dropout=0.0, attention_dropout=0.0, scan_layers=True)
    params = dec.init_decoder(jax.random.PRNGKey(0), cfg)

    eng = ServeEngine(
        params, cfg,
        ServeConfig(max_batch=4, max_prompt_len=32, max_len=96,
                    sync_lag=0, prompt_buckets=(8, 16)),
        SamplingConfig(greedy=True))

    # 2. a shared system prompt: ONE KV segment serves every matching slot
    system = [7, 11, 23, 42, 7, 9, 3, 5]
    eng.register_prefix(system, share=True)

    # 3. an adapter (zero-init here; a real one comes from
    #    `scripts/train.py --lora-rank ...` -> {output}/adapter)
    eng.load_adapter("tuned", strip_lora(
        add_lora(jax.random.PRNGKey(1), params, rank=4))[1])

    # 6. pay every compile now, not on the first user request
    n = eng.warmup()
    print(f"warmup compiled {n} admission flavors")

    # 1./4. a mixed wave: shared-prefix hits, an adapter request, a pinned
    # greedy row and a hot-sampling row, all in one pool
    h_sys1 = eng.submit(system + [101, 102], max_new_tokens=8)
    h_sys2 = eng.submit(system + [55], max_new_tokens=8, temperature=0.0)
    h_tuned = eng.submit([60, 61, 62], max_new_tokens=8, adapter="tuned")
    h_hot = eng.submit([80, 81], max_new_tokens=8, temperature=1.5,
                       top_k=20, top_p=0.9)  # per-request sampling
    for _ in range(3):
        eng.step()

    # mid-flight admission + 5. cancellation
    h_late = eng.submit([90, 91, 92, 93], max_new_tokens=64)
    eng.step()
    eng.cancel(h_late)
    eng.run()

    for name, h in [("sys-1", h_sys1), ("sys-2", h_sys2),
                    ("tuned", h_tuned), ("hot", h_hot),
                    ("cancelled", h_late)]:
        print(f"{name:>9}: done={h.done} tokens={h.tokens}")

    # every emitted token carries its raw-model log-prob
    lp = ", ".join(f"{x:.2f}" for x in h_sys1.logprobs[:4])
    print(f"  sys-1 logprobs[:4]: [{lp}]")
    assert len(h_sys1.logprobs) == len(h_sys1.tokens)

    # 7. observability
    print(f"stats: steps={eng.steps} emitted={eng.emitted_total} "
          f"prefix_hits={eng.prefix_hits} "
          f"shared_prefix_len={eng.shared_seg['len']}")
    assert h_sys1.done and h_sys2.done and h_tuned.done and h_hot.done
    assert eng.prefix_hits == 2
    print("OK")


if __name__ == "__main__":
    main()
