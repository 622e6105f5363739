"""Model-level tests: KosmosLanguage + Kosmos shapes, splice layout, the
double-scale parity flag, gradients, and multi-image support.

These are the working analogs of the reference's stale assertions
(/root/reference/tests/test_kosmos.py:22 expects (1,1024,64007);
/root/reference/tests/test_kosmos_lang.py:14-15 expects (1,32002) — both wrong
per SURVEY.md §2.6.6; the true contracts are asserted here)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kosmosx_tpu.core.config import (KosmosConfig, MagnetoConfig,
                                     ResamplerConfig, VisionConfig)
from kosmosx_tpu.data.splice import splice_embeddings, splice_single
from kosmosx_tpu.models.kosmos import Kosmos
from kosmosx_tpu.models.language import KosmosLanguage

DEC = MagnetoConfig(vocab_size=100, embed_dim=64, ffn_dim=128, layers=2,
                    heads=4, max_positions=256, use_flash_attention=False)
KCFG = KosmosConfig(
    decoder=DEC,
    vision=VisionConfig(image_size=28, patch_size=14, hidden_dim=32, layers=2,
                        heads=4, mlp_dim=64, use_flash_attention=False),
    resampler=ResamplerConfig(dim=32, depth=1, dim_head=8, heads=4,
                              num_latents=8, num_media_embeds=5),
    image_embed_len=8)


@pytest.fixture(scope="module")
def kosmos():
    return Kosmos(KCFG, seed=0)


def test_language_forward_shape():
    lm = KosmosLanguage(config=DEC, seed=0)
    toks = jnp.ones((3, 21), jnp.int32)
    out = lm(toks)
    # true contract: (B, S, vocab) — reference test expected (1, 32002) (stale)
    assert out.shape == (3, 21, 100)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_language_reference_kwargs_accepted():
    """Reference ctor surface incl. dead alibi flags (SURVEY.md §2.6.11)."""
    lm = KosmosLanguage(vocab_size=64, dim=32, depth=1, ffn_dim=64,
                        decoder_heads=4, alibi_pos_bias=True,
                        alibi_num_heads=2, max_rel_pos=64)
    out = lm(jnp.ones((1, 5), jnp.int32))
    assert out.shape == (1, 5, 64)


def test_kosmos_forward_shape(kosmos):
    """true contract: (B, S_text + 64img, vocab) (SURVEY.md §3.1) — here the
    tiny config's 8 image embeddings."""
    toks = jnp.ones((2, 16), jnp.int32)
    imgs = jnp.zeros((2, 3, 28, 28), jnp.float32)
    out = kosmos(toks, imgs)
    assert out.shape == (2, 16 + 8, 100)


@pytest.mark.slow
def test_kosmos_gradients_finite(kosmos):
    """Analog of the reference's NaN/Inf gradient scan
    (/root/reference/tests/test_kosmos.py:25-38)."""
    toks = jnp.ones((1, 8), jnp.int32)
    imgs = jnp.zeros((1, 3, 28, 28), jnp.float32)

    def loss(p):
        return jnp.mean(Kosmos.apply(p, toks, imgs, KCFG) ** 2)

    grads = jax.grad(loss)(kosmos.params)
    for leaf in jax.tree_util.tree_leaves(grads):
        assert bool(jnp.all(jnp.isfinite(leaf)))


@pytest.mark.slow
def test_double_scale_parity_flag(kosmos):
    """parity_double_scale=True reproduces the reference's double embed_scale
    (SURVEY.md §2.6.1); False applies it once. They must differ by design."""
    cfg_sane = dataclasses.replace(KCFG, parity_double_scale=False)
    toks = jnp.ones((1, 8), jnp.int32)
    imgs = jnp.zeros((1, 3, 28, 28), jnp.float32)
    out_parity = Kosmos.apply(kosmos.params, toks, imgs, KCFG)
    out_sane = Kosmos.apply(kosmos.params, toks, imgs, cfg_sane)
    assert not np.allclose(np.asarray(out_parity), np.asarray(out_sane))


def test_splice_single_layout():
    text = jnp.arange(12, dtype=jnp.float32).reshape(1, 6, 2)
    img = jnp.full((1, 3, 2), 99.0)
    out = splice_single(text, img, index=2)
    assert out.shape == (1, 9, 2)
    np.testing.assert_array_equal(np.asarray(out[0, :2]), np.asarray(text[0, :2]))
    np.testing.assert_array_equal(np.asarray(out[0, 2:5]), 99.0 * np.ones((3, 2)))
    np.testing.assert_array_equal(np.asarray(out[0, 5:]), np.asarray(text[0, 2:]))


@pytest.mark.slow
def test_splice_multi_matches_sequential_single():
    """General gather-splice == repeated concatenation splice."""
    key = jax.random.PRNGKey(0)
    text = jax.random.normal(key, (2, 10, 4))
    imgs = jax.random.normal(jax.random.fold_in(key, 1), (2, 2, 3, 4))
    positions = jnp.array([[1, 5], [2, 7]], jnp.int32)
    out = splice_embeddings(text, imgs, positions)
    assert out.shape == (2, 16, 4)
    for b in range(2):
        expect = text[b]
        # insert later blocks first so earlier indices stay valid
        for m in [1, 0]:
            pos = int(positions[b, m])
            expect = jnp.concatenate(
                [expect[:pos + 1], imgs[b, m], expect[pos + 1:]], axis=0)
        np.testing.assert_allclose(np.asarray(out[b]), np.asarray(expect),
                                   rtol=1e-6)


@pytest.mark.slow
def test_kosmos_multi_image(kosmos):
    toks = jnp.ones((1, 16), jnp.int32)
    imgs = jnp.zeros((1, 2, 3, 28, 28), jnp.float32)
    pos = jnp.array([[1, 10]], jnp.int32)
    out = Kosmos.apply(kosmos.params, toks, imgs, KCFG, image_positions=pos,
                       use_padding_mask=True)
    assert out.shape == (1, 16 + 2 * 8, 100)


@pytest.mark.slow
def test_kosmos_padding_mask_isolates_pad(kosmos):
    """With use_padding_mask, trailing pad tokens must not change real-token
    logits (the correct combined mask the reference lacks, SURVEY.md §3.4)."""
    toks_real = jax.random.randint(jax.random.PRNGKey(5), (1, 6), 2, 100)
    pad = jnp.full((1, 4), DEC.padding_idx, jnp.int32)
    toks_padded = jnp.concatenate([toks_real, pad], axis=1)
    imgs = jnp.zeros((1, 3, 28, 28), jnp.float32)
    out_p = Kosmos.apply(kosmos.params, toks_padded, imgs, KCFG,
                         use_padding_mask=True)
    out_r = Kosmos.apply(kosmos.params, toks_real, imgs, KCFG,
                         use_padding_mask=True)
    n_real = 6 + 8
    np.testing.assert_allclose(np.asarray(out_p[:, :n_real]),
                               np.asarray(out_r), atol=1e-4, rtol=1e-4)


def test_multi_image_default_positions_layout(devices):
    """Default multi-image splice: blocks follow back-to-back tag pairs in
    text coordinates (regression: (k+1)-spaced defaults scattered out of
    bounds and silently dropped an image)."""
    import jax
    from kosmosx_tpu.data.splice import splice_embeddings

    b, lt, d, m, k = 1, 8, 4, 2, 3
    text = jnp.arange(lt, dtype=jnp.float32)[None, :, None] * jnp.ones((1, 1, d))
    imgs = 100.0 + jnp.arange(m * k, dtype=jnp.float32).reshape(1, m, k, 1) \
        * jnp.ones((1, 1, 1, d))
    out = np.asarray(splice_embeddings(text, imgs))[0, :, 0]
    # default anchors (index=2): after text pos 1 and text pos 3
    # [t0, t1, I0 I1 I2, t2, t3, I3 I4 I5, t4..t7]
    expect = [0, 1, 100, 101, 102, 2, 3, 103, 104, 105, 4, 5, 6, 7]
    np.testing.assert_allclose(out, expect)
