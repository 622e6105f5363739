"""KV-cache generation: greedy decode must match step-by-step full forwards;
sampling controls must behave; multimodal prefill must work."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kosmosx_tpu.core.config import (KosmosConfig, MagnetoConfig,
                                     ResamplerConfig, VisionConfig)
from kosmosx_tpu.generate.sampler import (SamplingConfig, generate_multimodal,
                                          generate_text, sample_logits)
from kosmosx_tpu.models.kosmos import Kosmos
from kosmosx_tpu.nn import decoder as dec

CFG = MagnetoConfig(vocab_size=64, embed_dim=32, ffn_dim=64, layers=2,
                    heads=4, max_positions=128, use_flash_attention=False,
                    multiway=False, dropout=0.0)


@pytest.fixture(scope="module")
def lm_params():
    return dec.init_decoder(jax.random.PRNGKey(0), CFG)


@pytest.mark.slow
def test_greedy_matches_full_forward_loop(lm_params):
    """Greedy cached decode == naive re-run-full-forward greedy decode."""
    prompt = jax.random.randint(jax.random.PRNGKey(1), (2, 7), 4, CFG.vocab_size)
    scfg = SamplingConfig(max_new_tokens=6, greedy=True)
    out = generate_text(lm_params, CFG, prompt, scfg)

    seq = prompt
    naive = []
    for _ in range(6):
        logits = dec.decoder_forward(lm_params, seq, CFG)
        nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        naive.append(nxt)
        seq = jnp.concatenate([seq, nxt[:, None]], axis=1)
    naive = jnp.stack(naive, axis=1)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(naive))


def test_ragged_prompts(lm_params):
    """Per-batch prompt lengths: each row's continuation must equal the
    continuation of its unpadded prompt."""
    p_long = jax.random.randint(jax.random.PRNGKey(2), (1, 8), 4, CFG.vocab_size)
    p_short = jax.random.randint(jax.random.PRNGKey(3), (1, 5), 4, CFG.vocab_size)
    scfg = SamplingConfig(max_new_tokens=4, greedy=True)

    padded = jnp.concatenate(
        [p_short, jnp.full((1, 3), CFG.padding_idx, jnp.int32)], axis=1)
    batch = jnp.concatenate([p_long, padded], axis=0)
    lengths = jnp.array([8, 5], jnp.int32)
    out = generate_text(lm_params, CFG, batch, scfg, prompt_lengths=lengths)

    out_long = generate_text(lm_params, CFG, p_long, scfg)
    out_short = generate_text(lm_params, CFG, p_short, scfg)
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(out_long[0]))
    np.testing.assert_array_equal(np.asarray(out[1]), np.asarray(out_short[0]))


def test_eos_freezes_sequence(lm_params):
    prompt = jax.random.randint(jax.random.PRNGKey(4), (1, 4), 4, CFG.vocab_size)
    # eos = whatever greedy produces at step 2 -> everything after must be eos
    scfg0 = SamplingConfig(max_new_tokens=5, greedy=True)
    base = np.asarray(generate_text(lm_params, CFG, prompt, scfg0))[0]
    eos = int(base[1])
    scfg = SamplingConfig(max_new_tokens=5, greedy=True, eos_id=eos)
    out = np.asarray(generate_text(lm_params, CFG, prompt, scfg))[0]
    after = out[np.argmax(out == eos):]
    assert np.all(after == eos)


def test_sampling_controls():
    rng = jax.random.PRNGKey(0)
    logits = jnp.log(jnp.array([[0.5, 0.3, 0.15, 0.05]]))
    # top_k=1 == greedy
    tok = sample_logits(logits, rng, SamplingConfig(top_k=1))
    assert int(tok[0]) == 0
    # top_p=0.5 keeps only token 0
    tok = sample_logits(logits, rng, SamplingConfig(top_p=0.5))
    assert int(tok[0]) == 0
    # temperature ~0 == greedy
    tok = sample_logits(logits, rng, SamplingConfig(temperature=1e-6))
    assert int(tok[0]) == 0
    # full sampling hits non-argmax eventually
    toks = [int(sample_logits(logits, jax.random.PRNGKey(i),
                              SamplingConfig())[0]) for i in range(50)]
    assert len(set(toks)) > 1


@pytest.mark.slow
def test_multimodal_generation():
    kcfg = KosmosConfig(
        decoder=CFG,
        vision=VisionConfig(image_size=28, patch_size=14, hidden_dim=32,
                            layers=1, heads=2, mlp_dim=64,
                            use_flash_attention=False),
        resampler=ResamplerConfig(dim=32, depth=1, dim_head=8, heads=4,
                                  num_latents=8, num_media_embeds=5),
        image_embed_len=8)
    model = Kosmos(kcfg, seed=0)
    toks = jax.random.randint(jax.random.PRNGKey(5), (2, 6), 4, 64)
    imgs = jnp.zeros((2, 3, 28, 28), jnp.float32)
    scfg = SamplingConfig(max_new_tokens=5, greedy=True)
    out = generate_multimodal(model.params, kcfg, toks, imgs, scfg)
    assert out.shape == (2, 5)

    # greedy continuation must equal naive full-forward continuation
    logits = Kosmos.apply(model.params, toks, imgs, kcfg)
    first_naive = jnp.argmax(logits[:, -1], axis=-1)
    np.testing.assert_array_equal(np.asarray(out[:, 0]),
                                  np.asarray(first_naive))


def test_topk_topp_distributions():
    """top-k / top-p truncate support exactly; kept mass is renormalized."""
    logits = jnp.log(jnp.array([[0.5, 0.3, 0.15, 0.05]]))
    draws_k = [int(sample_logits(logits, jax.random.PRNGKey(i),
                                 SamplingConfig(top_k=2))[0])
               for i in range(200)]
    assert set(draws_k) <= {0, 1}
    frac0 = draws_k.count(0) / len(draws_k)
    assert 0.5 < frac0 < 0.75  # renormalized p(0) = 0.5/0.8 = 0.625

    draws_p = [int(sample_logits(logits, jax.random.PRNGKey(1000 + i),
                                 SamplingConfig(top_p=0.8))[0])
               for i in range(200)]
    assert set(draws_p) <= {0, 1}  # smallest set with cumulative >= 0.8


def test_sharded_generation_matches_unsharded(devices):
    """Generation under a (data, fsdp, tensor) mesh with sharded params ==
    unsharded generation — SPMD serving works with no code changes."""
    from kosmosx_tpu.parallel.mesh import make_mesh
    from kosmosx_tpu.parallel.sharding import shard_params

    params = dec.init_decoder(jax.random.PRNGKey(7), CFG)
    prompt = jax.random.randint(jax.random.PRNGKey(8), (4, 6), 4, CFG.vocab_size)
    scfg = SamplingConfig(max_new_tokens=5, greedy=True)
    ref = np.asarray(generate_text(params, CFG, prompt, scfg))

    mesh = make_mesh(data=2, fsdp=2, tensor=2)
    with mesh:
        sharded = shard_params(params, mesh)
        out = np.asarray(generate_text(sharded, CFG, prompt, scfg))
    np.testing.assert_array_equal(ref, out)


def test_flash_prefill_matches_jnp_prefill(lm_params):
    """Generation with a flash-eligible prompt (>=256 tokens) through the
    Pallas prefill path == the plain-jnp prefill path."""
    import dataclasses
    cfg_flash = dataclasses.replace(CFG, use_flash_attention=True,
                                    max_positions=512,
                                    flash_block_q=128, flash_block_kv=128)
    cfg_jnp = dataclasses.replace(cfg_flash, use_flash_attention=False)
    params = dec.init_decoder(jax.random.PRNGKey(9), cfg_flash)
    prompt = jax.random.randint(jax.random.PRNGKey(10), (2, 300), 4,
                                CFG.vocab_size)
    scfg = SamplingConfig(max_new_tokens=4, greedy=True)
    out_flash = generate_text(params, cfg_flash, prompt, scfg, interpret=True)
    out_jnp = generate_text(params, cfg_jnp, prompt, scfg)
    np.testing.assert_array_equal(np.asarray(out_flash), np.asarray(out_jnp))
