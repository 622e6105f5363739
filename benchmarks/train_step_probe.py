"""Steady-state flagship train-step time: XLA erf-gelu vs gelu_fast.

The forward saves 27.5 ms with gelu_fast (BASELINE.md gelu study); the
backward should save more in proportion — the erf-gelu VJP needs BOTH erf
(recomputed under remat) and exp(-x²/2), while gelu_fast's VJP is
tanh-based (sech² = 1 − tanh², reusing the forward's tanh under the dots
remat policy).

Setup = examples/train_flagship_1chip.py (bf16 params, blockwise-int8 Lion,
dots remat, donated step). Timing: per-step loss fetch (host sync); the
~26 ms tunnel RTT is ~5% of a ~500 ms step and identical for both arms.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from kosmosx_tpu.core.config import MagnetoConfig
from kosmosx_tpu.core.dtypes import cast_tree
from kosmosx_tpu.nn import decoder as dec
from kosmosx_tpu.train.data import synthetic_text_batches
from kosmosx_tpu.train.trainer import TrainConfig, Trainer, lm_loss_fn

BATCH = int(os.environ.get("TSP_BATCH", "4"))
SEQ = int(os.environ.get("TSP_SEQ", "512"))
WARM = 2
TIMED = 6


def measure(activation: str) -> float:
    cfg = MagnetoConfig(compute_dtype="bfloat16", scan_layers=True,
                        remat=True, remat_policy="dots",
                        dropout=0.0, attention_dropout=0.0,
                        use_flash_attention=True, max_positions=8194,
                        activation=activation)
    tcfg = TrainConfig(batch_size=BATCH, seq_len=SEQ, learning_rate=1e-4,
                       optimizer="lion8bit", schedule="constant",
                       total_steps=WARM + TIMED, warmup_steps=1,
                       checkpoint_every=0, log_every=100,
                       data=1, fsdp=1, tensor=1)
    trainer = Trainer(
        init_fn=lambda key: cast_tree(dec.init_decoder(key, cfg),
                                      jnp.bfloat16),
        loss_fn=lm_loss_fn(cfg), cfg=tcfg)
    batches = synthetic_text_batches(batch_size=BATCH, seq_len=SEQ,
                                     vocab_size=cfg.vocab_size,
                                     steps=WARM + TIMED)
    state = trainer.init_state()
    step_fn = trainer._build_step()
    times = []
    for i, b in enumerate(batches):
        sb = trainer.shard_batch(b)
        t0 = time.perf_counter()
        state, metrics = step_fn(state, sb)
        loss = float(metrics["loss"])  # host sync
        dt = time.perf_counter() - t0
        if i >= WARM:
            times.append(dt)
    best = min(times)
    tps = BATCH * SEQ / best
    print(f"{activation}: {best * 1e3:.1f} ms/step = {tps:,.0f} tok/s "
          f"(loss {loss:.3f}; steps {[f'{t * 1e3:.0f}' for t in times]})",
          flush=True)
    del state, trainer
    return best


def main():
    print(f"devices: {jax.devices()}  batch {BATCH} seq {SEQ}", flush=True)
    t_erf = measure("gelu")
    t_fast = measure("gelu_fast")
    print(f"gelu_fast saves {(t_erf - t_fast) * 1e3:+.1f} ms/step "
          f"({(t_erf / t_fast - 1) * 100:.1f}% faster)", flush=True)


if __name__ == "__main__":
    main()
