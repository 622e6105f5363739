"""Blockwise-int8 optimizer state (train/quant.py): quantization error
bounds, memory reduction, convergence tracking fp32, and trainer
integration — the bnb Adam8bit/Lion8bit parity the reference ships
commented out (SURVEY.md §2.4)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from kosmosx_tpu.core.config import MagnetoConfig
from kosmosx_tpu.nn import decoder as dec
from kosmosx_tpu.train.quant import (BLOCK, adamw8bit, dequantize_blockwise,
                                     lion8bit, quantize_blockwise)

CFG = MagnetoConfig(vocab_size=64, embed_dim=32, ffn_dim=64, layers=2,
                    heads=4, max_positions=64, use_flash_attention=False,
                    multiway=False, dropout=0.0, attention_dropout=0.0)


def test_quantize_roundtrip_error_bound():
    x = jax.random.normal(jax.random.PRNGKey(0), (1000,)) * 10.0
    qs = quantize_blockwise(x, signed=True)
    y = dequantize_blockwise(qs, x.shape)
    # per-block error bound: absmax/127 (half a code step after rounding)
    flat = np.asarray(x)
    err = np.abs(np.asarray(y) - flat)
    pad = (-flat.size) % BLOCK
    blocks = np.pad(flat, (0, pad)).reshape(-1, BLOCK)
    bounds = np.repeat(np.abs(blocks).max(1) / 127.0, BLOCK)[:flat.size]
    assert np.all(err <= bounds + 1e-7)


def test_quantize_unsigned_nonnegative():
    x = jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (512,)))
    qs = quantize_blockwise(x, signed=False)
    y = dequantize_blockwise(qs, x.shape)
    assert float(jnp.min(y)) >= 0.0
    np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                               atol=float(jnp.max(x)) / 255 + 1e-7)


def test_state_memory_reduction():
    params = dec.init_decoder(jax.random.PRNGKey(0), CFG)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    opt = adamw8bit(1e-3)
    state = opt.init(params)
    state_bytes = sum(x.size * x.dtype.itemsize
                      for x in jax.tree_util.tree_leaves(state))
    fp32_bytes = 2 * 4 * n_params  # two fp32 moments
    assert state_bytes < 0.45 * fp32_bytes  # ~(1+4/256)*2 bytes/param + pad


@pytest.mark.parametrize("make8,make32", [
    (lambda: adamw8bit(1e-2, b1=0.9, b2=0.999),
     lambda: optax.adamw(1e-2, b1=0.9, b2=0.999, weight_decay=0.0)),
    (lambda: lion8bit(8e-3, b1=0.9, b2=0.99),
     lambda: optax.lion(8e-3, b1=0.9, b2=0.99, weight_decay=0.0)),
])
def test_8bit_tracks_fp32_on_quadratic(make8, make32):
    """Minimize ||x - t||^2: 8-bit and fp32 variants converge to similar
    loss (quantization noise must not break optimization)."""
    target = jax.random.normal(jax.random.PRNGKey(2), (300,))

    def run(opt):
        x = jnp.zeros((300,))
        state = opt.init(x)
        for _ in range(120):
            g = 2 * (x - target)
            upd, state = opt.update(g, state, x)
            x = optax.apply_updates(x, upd)
        return float(jnp.mean((x - target) ** 2))

    l8 = run(make8())
    l32 = run(make32())
    l_init = float(jnp.mean(target ** 2))
    assert l8 < 0.5 * l_init, (l8, l_init)       # it optimizes
    assert l8 < 2.5 * l32 + 0.05, (l8, l32)      # and tracks fp32


@pytest.mark.slow
def test_trainer_integration_8bit(devices):
    from kosmosx_tpu.train.data import synthetic_text_batches
    from kosmosx_tpu.train.trainer import TrainConfig, Trainer, lm_loss_fn

    tcfg = TrainConfig(batch_size=4, seq_len=16, learning_rate=3e-3,
                       optimizer="adamw8bit", schedule="constant",
                       total_steps=30, warmup_steps=1, checkpoint_every=0,
                       log_every=1000, data=2, fsdp=2, tensor=2)
    trainer = Trainer(init_fn=lambda key: dec.init_decoder(key, CFG),
                      loss_fn=lm_loss_fn(CFG), cfg=tcfg)
    batches = list(synthetic_text_batches(
        batch_size=4, seq_len=16, vocab_size=CFG.vocab_size, steps=25))
    state, metrics = trainer.run(iter(batches), steps=25)
    l_final = float(metrics["loss"])
    l_init = float(lm_loss_fn(CFG)(
        dec.init_decoder(jax.random.PRNGKey(tcfg.seed), CFG), batches[0],
        jax.random.PRNGKey(0))[0])
    assert l_final < l_init * 0.95, (l_final, l_init)
