"""Draft distillation (train/distill.py) and its effect on speculative
acceptance — the end-to-end story: distill a shallow draft from a target,
then verify the speculative acceptance rate rises far above the untrained
draft's chance level.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kosmosx_tpu.core.config import MagnetoConfig
from kosmosx_tpu.generate import SamplingConfig, generate_text
from kosmosx_tpu.generate.speculative import speculative_generate
from kosmosx_tpu.nn import decoder as dec
from kosmosx_tpu.train.data import synthetic_text_batches
from kosmosx_tpu.train.distill import distill_draft, distill_loss

TARGET = MagnetoConfig(vocab_size=61, embed_dim=48, ffn_dim=96, layers=2,
                       heads=4, max_positions=128, multiway=False,
                       dropout=0.0, attention_dropout=0.0, scan_layers=True,
                       use_flash_attention=False, compute_dtype="float32")
DRAFT = MagnetoConfig(vocab_size=61, embed_dim=32, ffn_dim=64, layers=1,
                      heads=4, max_positions=128, multiway=False,
                      dropout=0.0, attention_dropout=0.0, scan_layers=True,
                      use_flash_attention=False, compute_dtype="float32")


def test_distill_loss_zero_for_identical_logits():
    logits = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 13))
    loss, m = distill_loss(logits, logits)
    assert float(loss) < 1e-6
    assert float(m["teacher_agreement"]) == 1.0


def test_distill_loss_respects_mask():
    a = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 7))
    b = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 7))
    mask = jnp.asarray([[1.0, 1.0, 0.0, 0.0]])
    loss_masked, _ = distill_loss(a, b, mask)
    # zeroed positions must not contribute
    b2 = b.at[:, 2:].set(123.0)
    loss_masked2, _ = distill_loss(a, b2, mask)
    np.testing.assert_allclose(float(loss_masked), float(loss_masked2),
                               rtol=1e-6)


@pytest.mark.slow
def test_distillation_raises_speculative_acceptance():
    teacher = dec.init_decoder(jax.random.PRNGKey(0), TARGET)

    def batches():
        return synthetic_text_batches(batch_size=8, seq_len=32,
                                      vocab_size=TARGET.vocab_size, seed=3)

    draft0 = dec.init_decoder(jax.random.PRNGKey(7), DRAFT)
    draft1, metrics = distill_draft(teacher, TARGET, DRAFT, batches(),
                                    steps=300, learning_rate=3e-3, seed=7)
    assert metrics["teacher_agreement"] > 0.4   # learned to mimic

    prompt = next(iter(batches()))["input_ids"][:2, :8]
    prompt = jnp.asarray(prompt, jnp.int32)
    scfg = SamplingConfig(max_new_tokens=16, greedy=True)

    out0, s0 = speculative_generate(teacher, draft0, TARGET, DRAFT,
                                    prompt, scfg, gamma=3)
    out1, s1 = speculative_generate(teacher, draft1, TARGET, DRAFT,
                                    prompt, scfg, gamma=3)
    rate0 = s0["accepted"] / max(s0["proposed"], 1)
    rate1 = s1["accepted"] / max(s1["proposed"], 1)
    assert rate1 > rate0 + 0.1, (rate0, rate1)
    assert s1["rounds"] < s0["rounds"]

    # and correctness is draft-independent
    ref = generate_text(teacher, TARGET, prompt, scfg)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(ref))
    np.testing.assert_array_equal(np.asarray(out0), np.asarray(ref))
