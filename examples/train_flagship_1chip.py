"""Train the FULL 2.88B-param flagship decoder on ONE 16 GiB TPU chip.

The reference requires a multi-GPU FSDP/DeepSpeed-ZeRO cluster to train this
model (/root/reference/train.py:116-200 + config/zero3.json). Here the whole
thing fits on a single v5e chip:

- bf16 parameters (5.4 GiB) — no fp32 master copy, no loss scaling needed;
- blockwise-int8 Lion momentum (train/quant.py, ~3 GiB instead of 11.5 GiB
  fp32 — the bnb Lion8bit the reference ships commented out);
- remat with the dots_saveable policy (recompute elementwise, keep matmul
  outputs);
- bf16 gradients via the donated-buffer train step.

Measured on chip: ~1,250 tokens/sec at batch 1 / seq 512, loss decreasing
from step one (BASELINE.md).

Run: python examples/train_flagship_1chip.py [batch] [seq] [steps]
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax.numpy as jnp

from kosmosx_tpu.core.config import MagnetoConfig
from kosmosx_tpu.core.dtypes import cast_tree
from kosmosx_tpu.nn import decoder as dec
from kosmosx_tpu.train.data import synthetic_text_batches
from kosmosx_tpu.train.trainer import TrainConfig, Trainer, lm_loss_fn


def main(batch: int = 1, seq: int = 512, steps: int = 10):
    cfg = MagnetoConfig(compute_dtype="bfloat16", scan_layers=True,
                        remat=True, remat_policy="dots",
                        dropout=0.0, attention_dropout=0.0,
                        use_flash_attention=True, max_positions=8194)
    tcfg = TrainConfig(batch_size=batch, seq_len=seq, learning_rate=1e-4,
                       optimizer="lion8bit", schedule="constant",
                       total_steps=max(steps, 2), warmup_steps=1,
                       checkpoint_every=0, log_every=1,
                       data=1, fsdp=1, tensor=1)
    trainer = Trainer(
        init_fn=lambda key: cast_tree(dec.init_decoder(key, cfg),
                                      jnp.bfloat16),
        loss_fn=lm_loss_fn(cfg), cfg=tcfg)
    batches = synthetic_text_batches(batch_size=batch, seq_len=seq,
                                     vocab_size=cfg.vocab_size, steps=steps)
    t0 = time.time()
    state, metrics = trainer.run(batches, steps=steps)
    dt = time.time() - t0
    print(f"trained 2.88B decoder on 1 chip: {steps} steps, "
          f"final loss {float(metrics['loss']):.3f}, "
          f"~{batch * seq * steps / dt:,.0f} tok/s incl. compile")


if __name__ == "__main__":
    import sys

    a = [int(x) for x in sys.argv[1:4]]
    main(*a)
