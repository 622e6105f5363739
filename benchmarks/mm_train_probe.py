"""Multimodal flagship train step on ONE chip: CLIP tower inside the
loss/backward (VERDICT round-2 item 5).

The reference's *intent* is multimodal training (/root/reference/train.py:
521-647 builds Kosmos + FSDP + Lion) but its loss call is broken and its
data is text-only (SURVEY.md §2.6.4) — it never actually trained the CLIP
tower in the loop. This probe times the REAL thing: the full Kosmos
(CLIP ViT-L/14 + resampler + 24L decoder, 2.88B params) with
``kosmos_loss_fn`` (CE over the spliced sequence, image positions excluded)
at decoder sequence 1984 text + 64 image = 2048, bf16, dots remat,
blockwise-int8 Lion — the single-chip recipe from
examples/train_flagship_1chip.py.

Timing = per-step loss fetch (host sync; bench.py rules — distinct inputs
per step, identical executions are tunnel-cached). Record tokens/sec/chip in
BASELINE.md next to the text-only 5,638 figure; if a batch OOMs, record the
config note (the 16 GiB chip bounds batch x seq).

Usage: MMT_BATCH=1 MMT_TEXT=1984 python benchmarks/mm_train_probe.py
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
from kosmosx_tpu.train.data import synthetic_multimodal_batches
from kosmosx_tpu.train.trainer import TrainConfig, Trainer, kosmos_loss_fn

BATCH = int(os.environ.get("MMT_BATCH", "1"))
TEXT_LEN = int(os.environ.get("MMT_TEXT", "1984"))  # + 64 image embeds = 2048
# MMT_FREEZE=1: freeze the CLIP tower (TrainConfig.freeze=("clip",)) — no
# CLIP grads/backward activations/Lion moments; the round-3 verdict's
# candidate for unlocking batch 2 (batch 2 unfrozen was 182 MB over HBM)
FREEZE = os.environ.get("MMT_FREEZE", "") not in ("", "0")
WARM = 2
TIMED = 6


def main():
    kcfg = KosmosConfig(
        decoder=MagnetoConfig(compute_dtype="bfloat16", scan_layers=True,
                              remat=True, remat_policy="dots",
                              dropout=0.0, attention_dropout=0.0,
                              use_flash_attention=True, max_positions=8194,
                              # 1024^2 blocks OOM the flash BACKWARD's scoped
                              # VMEM at seq 2048 (21 MB > 16 MB limit measured
                              # on-chip); training runs 512^2
                              flash_block_q=512, flash_block_kv=512),
        vision=VisionConfig(compute_dtype="bfloat16"),
        resampler=ResamplerConfig(compute_dtype="bfloat16"))
    tcfg = TrainConfig(batch_size=BATCH, seq_len=TEXT_LEN, learning_rate=1e-4,
                       optimizer="lion8bit", schedule="constant",
                       total_steps=WARM + TIMED, warmup_steps=1,
                       checkpoint_every=0, log_every=100, prefetch=False,
                       data=1, fsdp=1, tensor=1,
                       freeze=("clip",) if FREEZE else ())
    print(f"devices: {jax.devices()}  batch {BATCH} text {TEXT_LEN} "
          f"(+64 image embeds) freeze={'clip' if FREEZE else 'none'}",
          flush=True)
    trainer = Trainer(
        init_fn=lambda key: init_casted(lambda k: Kosmos.init(k, kcfg),
                                        key, jnp.bfloat16),
        loss_fn=kosmos_loss_fn(kcfg), cfg=tcfg)
    state = trainer.init_state()
    n = sum(x.size for x in jax.tree_util.tree_leaves(state["params"]))
    print(f"params {n / 1e9:.2f}B", flush=True)
    step_fn = trainer._build_step()
    batches = synthetic_multimodal_batches(
        batch_size=BATCH, seq_len=TEXT_LEN,
        vocab_size=kcfg.decoder.vocab_size,
        image_size=kcfg.vision.image_size, steps=WARM + TIMED)
    times, loss = [], float("nan")
    for i, b in enumerate(batches):
        sb = trainer.shard_batch(b)
        t0 = time.perf_counter()
        state, metrics = step_fn(state, sb)
        loss = float(metrics["loss"])  # host sync
        dt = time.perf_counter() - t0
        print(f"step {i}: {dt * 1e3:.0f} ms loss {loss:.3f}", flush=True)
        if i >= WARM:
            times.append(dt)
    best = min(times)
    # tokens/sec counts the full spliced sequence (text + image positions),
    # matching the headline bench's images+text accounting
    tps = BATCH * (TEXT_LEN + 64) / best
    print(f"multimodal train step: {best * 1e3:.1f} ms/step = "
          f"{tps:,.0f} images+text tok/s/chip (loss {loss:.3f})", flush=True)


if __name__ == "__main__":
    main()
