"""Tiny sharded training run on the virtual CPU mesh (or real devices).

Drives the full Trainer: (data, fsdp, tensor) mesh, Lion optimizer with
decay/no-decay groups, cosine warmup, grad clip, checkpointing — the
reference train.py pipeline (/root/reference/train.py:486-695) rebuilt as one
pjit step. Loss must decrease.
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["PALLAS_AXON_POOL_IPS"] = ""

import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

from kosmosx_tpu.core.config import MagnetoConfig  # noqa: E402
from kosmosx_tpu.nn import decoder as dec  # noqa: E402
from kosmosx_tpu.train.data import synthetic_text_batches  # noqa: E402
from kosmosx_tpu.train.trainer import TrainConfig, Trainer, lm_loss_fn  # noqa: E402


def main():
    print("devices:", jax.devices())
    cfg = MagnetoConfig(vocab_size=256, embed_dim=64, ffn_dim=128, layers=2,
                        heads=4, max_positions=128, use_flash_attention=False,
                        multiway=False, dropout=0.0, attention_dropout=0.0)
    tcfg = TrainConfig(batch_size=8, seq_len=64, learning_rate=1e-3,
                       optimizer="lion", schedule="cosine", total_steps=100,
                       warmup_steps=5, checkpoint_every=0, log_every=10,
                       data=2, fsdp=2, tensor=2)
    trainer = Trainer(init_fn=lambda key: dec.init_decoder(key, cfg),
                      loss_fn=lm_loss_fn(cfg), cfg=tcfg)
    print("mesh:", trainer.mesh)

    losses = []

    def log(step, m):
        losses.append(m["loss"])
        print(f"step {step:4d}  loss {m['loss']:.4f}  acc {m['accuracy']:.3f}  "
              f"lr {m['lr']:.2e}  {m['steps_per_sec']:.2f} it/s")

    batches = synthetic_text_batches(batch_size=8, seq_len=64,
                                     vocab_size=256, steps=100)
    trainer.cfg = tcfg
    state, metrics = trainer.run(batches, steps=100, log_fn=log)
    final = float(metrics["loss"])
    print(f"final loss {final:.4f} (first {losses[0]:.4f})")
    assert final < losses[0], "loss did not decrease"
    print("OK")


if __name__ == "__main__":
    main()
