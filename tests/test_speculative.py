"""Speculative decoding (generate/speculative.py).

The contract: greedy speculative output == plain greedy generate_text on
the target model, for ANY draft (the draft only affects speed, never the
result). Acceptance statistics sanity-check the speedup mechanism.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kosmosx_tpu.core.config import MagnetoConfig
from kosmosx_tpu.generate import SamplingConfig, generate_text
from kosmosx_tpu.generate.speculative import speculative_generate
from kosmosx_tpu.nn import decoder as dec

TARGET = MagnetoConfig(vocab_size=97, embed_dim=64, ffn_dim=128, layers=3,
                       heads=4, max_positions=256, multiway=False,
                       dropout=0.0, attention_dropout=0.0, scan_layers=True,
                       use_flash_attention=False, compute_dtype="float32")
DRAFT = MagnetoConfig(vocab_size=97, embed_dim=32, ffn_dim=64, layers=1,
                      heads=4, max_positions=256, multiway=False,
                      dropout=0.0, attention_dropout=0.0, scan_layers=True,
                      use_flash_attention=False, compute_dtype="float32")


@pytest.fixture(scope="module")
def models():
    pt = dec.init_decoder(jax.random.PRNGKey(0), TARGET)
    pd = dec.init_decoder(jax.random.PRNGKey(1), DRAFT)
    return pt, pd


def _prompt(b=2, lp=7, seed=5):
    return jax.random.randint(jax.random.PRNGKey(seed), (b, lp), 4,
                              TARGET.vocab_size, jnp.int32)


@pytest.mark.parametrize("gamma", [1, 3, 5])
def test_greedy_matches_generate_text(models, gamma):
    pt, pd = models
    prompt = _prompt()
    scfg = SamplingConfig(max_new_tokens=12, greedy=True)
    ref = generate_text(pt, TARGET, prompt, scfg)
    out, stats = speculative_generate(pt, pd, TARGET, DRAFT, prompt, scfg,
                                      gamma=gamma)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    assert stats["rounds"] >= 1


@pytest.mark.slow
def test_self_draft_accepts_everything(models):
    """Draft == target -> every greedy proposal accepted: rounds collapse to
    ceil((T-1)/(gamma+1))."""
    pt, _ = models
    prompt = _prompt()
    scfg = SamplingConfig(max_new_tokens=13, greedy=True)
    out, stats = speculative_generate(pt, pt, TARGET, TARGET, prompt, scfg,
                                      gamma=3)
    ref = generate_text(pt, TARGET, prompt, scfg)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    assert stats["rounds"] == -(-(13 - 1) // 4)  # 3 rounds of gamma+1


@pytest.mark.slow
def test_greedy_with_eos_matches(models):
    pt, pd = models
    prompt = _prompt(seed=11)
    probe = generate_text(pt, TARGET, prompt,
                          SamplingConfig(max_new_tokens=12, greedy=True))
    eos = int(np.asarray(probe)[0, 4])  # force a mid-stream eos for row 0
    scfg = SamplingConfig(max_new_tokens=12, greedy=True, eos_id=eos)
    ref = generate_text(pt, TARGET, prompt, scfg)
    out, _ = speculative_generate(pt, pd, TARGET, DRAFT, prompt, scfg,
                                  gamma=3)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_ragged_prompts(models):
    pt, pd = models
    prompt = _prompt(b=3, lp=9, seed=13)
    lengths = jnp.asarray([9, 5, 7], jnp.int32)
    scfg = SamplingConfig(max_new_tokens=8, greedy=True)
    ref = generate_text(pt, TARGET, prompt, scfg, prompt_lengths=lengths)
    out, _ = speculative_generate(pt, pd, TARGET, DRAFT, prompt, scfg,
                                  gamma=2, prompt_lengths=lengths)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_temperature_sampling_self_draft_valid(models):
    """With draft == target, rejection sampling accepts (p_t/p_d = 1) and
    the output must be a valid token sequence with full length."""
    pt, _ = models
    prompt = _prompt(seed=17)
    scfg = SamplingConfig(max_new_tokens=10, temperature=0.8)
    out, stats = speculative_generate(pt, pt, TARGET, TARGET, prompt, scfg,
                                      gamma=3, rng=jax.random.PRNGKey(42))
    arr = np.asarray(out)
    assert arr.shape == (2, 10)
    assert (arr >= 0).all() and (arr < TARGET.vocab_size).all()
    assert stats["accepted"] > 0


def test_topk_rejected(models):
    pt, pd = models
    with pytest.raises(NotImplementedError):
        speculative_generate(pt, pd, TARGET, DRAFT, _prompt(),
                             SamplingConfig(max_new_tokens=4, top_k=5),
                             gamma=2)
