"""Beam search (generate/beam.py): greedy equivalence at K=1, score
consistency (the reported log-prob must equal an independent full-forward
evaluation of the returned sequence), beam monotonicity, EOS freezing, and
batch independence.

Capability beyond the reference (no generation loop upstream, SURVEY.md §1).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kosmosx_tpu.core.config import MagnetoConfig
from kosmosx_tpu.generate import SamplingConfig, beam_search, generate_text
from kosmosx_tpu.nn import decoder as dec

CFG = MagnetoConfig(vocab_size=61, embed_dim=32, ffn_dim=64, layers=2,
                    heads=4, max_positions=64, use_flash_attention=False,
                    multiway=False, dropout=0.0, attention_dropout=0.0)


@pytest.fixture(scope="module")
def params():
    return dec.init_decoder(jax.random.PRNGKey(0), CFG)


def _seq_logprob(params, prompt, gen, plen=None):
    """Independent evaluation: full forward over prompt+gen, sum the
    log-probs of each generated token."""
    full = jnp.concatenate([jnp.asarray(prompt), jnp.asarray(gen)])[None, :]
    logits = dec.decoder_forward(params, full, CFG).astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    lp = len(prompt) if plen is None else plen
    total = 0.0
    for t in range(len(gen)):
        pos = lp + t - 1  # logits at pos predict token at pos+1
        total += float(logp[0, pos, int(gen[t])])
    return total


def test_beam1_matches_greedy(params):
    prompt = jnp.asarray([[5, 9, 2, 33]], jnp.int32)
    new = 6
    ref = generate_text(params, CFG, prompt,
                        SamplingConfig(max_new_tokens=new, greedy=True))
    toks, norm, raw = beam_search(params, CFG, prompt, beam_size=1,
                                  max_new_tokens=new)
    assert [int(t) for t in toks[0, 0]] == [int(t) for t in ref[0]]


def test_reported_score_is_true_logprob(params):
    prompt = jnp.asarray([[7, 11, 4]], jnp.int32)
    new = 5
    toks, norm, raw = beam_search(params, CFG, prompt, beam_size=4,
                                  max_new_tokens=new)
    for k in range(4):
        gen = [int(t) for t in toks[0, k]]
        want = _seq_logprob(params, [7, 11, 4], gen)
        np.testing.assert_allclose(float(raw[0, k]), want, atol=2e-3,
                                   err_msg=f"beam {k}: {gen}")
    # beams sorted best-first (length_penalty=1, equal lengths)
    assert float(raw[0, 0]) >= float(raw[0, 1]) >= float(raw[0, 3])


@pytest.mark.slow
def test_wider_beam_never_worse(params):
    prompt = jnp.asarray([[3, 19, 42, 8, 27]], jnp.int32)
    new = 6
    scores = []
    for k in (1, 2, 8):
        _, _, raw = beam_search(params, CFG, prompt, beam_size=k,
                                max_new_tokens=new)
        scores.append(float(raw[0, 0]))
    assert scores[1] >= scores[0] - 1e-5
    assert scores[2] >= scores[1] - 1e-5


@pytest.mark.slow
def test_eos_freezes_beam(params):
    """Force an EOS id that greedy hits early; positions after it must be
    EOS and the raw score must stop accumulating."""
    prompt = jnp.asarray([[5, 9, 2, 33]], jnp.int32)
    new = 8
    ref = generate_text(params, CFG, prompt,
                        SamplingConfig(max_new_tokens=new, greedy=True))
    eos = int(ref[0, 2])  # whatever greedy emits 3rd becomes "EOS"
    toks, norm, raw = beam_search(params, CFG, prompt, beam_size=3,
                                  max_new_tokens=new, eos_id=eos)
    for k in range(3):
        gen = [int(t) for t in toks[0, k]]
        if eos in gen:
            i = gen.index(eos)
            assert all(t == eos for t in gen[i:]), gen
            # score equals the true log-prob of the sequence UP TO eos
            want = _seq_logprob(params, [5, 9, 2, 33], gen[:i + 1])
            np.testing.assert_allclose(float(raw[0, k]), want, atol=2e-3)


@pytest.mark.slow
def test_batch_rows_independent(params):
    p0 = [5, 9, 2, 33]
    p1 = [44, 3, 17, 8]
    new = 5
    toks_b, _, raw_b = beam_search(
        params, CFG, jnp.asarray([p0, p1], jnp.int32), beam_size=3,
        max_new_tokens=new)
    for i, p in enumerate((p0, p1)):
        toks_i, _, raw_i = beam_search(
            params, CFG, jnp.asarray([p], jnp.int32), beam_size=3,
            max_new_tokens=new)
        np.testing.assert_array_equal(np.asarray(toks_b[i]),
                                      np.asarray(toks_i[0]))
        np.testing.assert_allclose(np.asarray(raw_b[i]),
                                   np.asarray(raw_i[0]), atol=1e-4)


@pytest.mark.slow
def test_multimodal_beam1_matches_greedy(params):
    """Kosmos beam search at K=1 must equal greedy generate_multimodal
    (same prefill, same double-scale decode convention)."""
    from kosmosx_tpu.core.config import (KosmosConfig, ResamplerConfig,
                                         VisionConfig)
    from kosmosx_tpu.generate import beam_search_multimodal, \
        generate_multimodal
    from kosmosx_tpu.models.kosmos import Kosmos

    kcfg = KosmosConfig(
        decoder=CFG,
        vision=VisionConfig(image_size=28, patch_size=14, hidden_dim=32,
                            layers=1, heads=2, mlp_dim=64,
                            use_flash_attention=False),
        resampler=ResamplerConfig(dim=32, depth=1, dim_head=8, heads=4,
                                  num_latents=8, num_media_embeds=5),
        image_embed_len=8)
    model = Kosmos(kcfg, seed=0)
    toks = jax.random.randint(jax.random.PRNGKey(5), (2, 6), 4,
                              CFG.vocab_size)
    imgs = jnp.zeros((2, 3, 28, 28), jnp.float32)
    ref = generate_multimodal(model.params, kcfg, toks, imgs,
                              SamplingConfig(max_new_tokens=5, greedy=True))
    beams, norm, raw = beam_search_multimodal(
        model.params, kcfg, toks, imgs, beam_size=1, max_new_tokens=5)
    np.testing.assert_array_equal(np.asarray(beams[:, 0]), np.asarray(ref))
    # wider beam never worse on the raw log-prob of the best beam
    _, _, raw3 = beam_search_multimodal(
        model.params, kcfg, toks, imgs, beam_size=3, max_new_tokens=5)
    assert float(raw3[0, 0]) >= float(raw[0, 0]) - 1e-5


def test_ragged_prompts(params):
    """Padded prompt rows with explicit lengths match unpadded runs."""
    p_short = [5, 9]
    new = 4
    padded = jnp.asarray([p_short + [1, 1]], jnp.int32)
    toks_p, _, raw_p = beam_search(params, CFG, padded, beam_size=2,
                                   max_new_tokens=new,
                                   prompt_lengths=jnp.asarray([2], jnp.int32))
    toks_u, _, raw_u = beam_search(params, CFG,
                                   jnp.asarray([p_short], jnp.int32),
                                   beam_size=2, max_new_tokens=new)
    np.testing.assert_array_equal(np.asarray(toks_p), np.asarray(toks_u))
