"""Magneto decoder stack invariants: scan==loop, remat==no-remat, multiway
param layout, KV-cache decode == full forward, embed-scale semantics."""

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kosmosx_tpu.core.config import MagnetoConfig
from kosmosx_tpu.nn import decoder as dec
from kosmosx_tpu.utils.pytree import param_count

CFG = MagnetoConfig(vocab_size=128, embed_dim=64, ffn_dim=128, layers=3,
                    heads=4, max_positions=128, use_flash_attention=False,
                    multiway=False)


def _params(cfg=CFG, seed=0):
    return dec.init_decoder(jax.random.PRNGKey(seed), cfg)


def test_forward_shape_and_finite():
    p = _params()
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 17), 0, CFG.vocab_size)
    logits = dec.decoder_forward(p, toks, CFG)
    assert logits.shape == (2, 17, CFG.vocab_size)
    assert bool(jnp.all(jnp.isfinite(logits)))


@pytest.mark.slow
def test_scan_matches_loop():
    cfg_scan = dataclasses.replace(CFG, scan_layers=True)
    key = jax.random.PRNGKey(0)
    p_loop = dec.init_decoder(key, CFG)
    # stack the loop params to build identical scan params
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *p_loop["layers"])
    p_scan = {**p_loop, "layers": stacked}
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, CFG.vocab_size)
    out_loop = dec.decoder_forward(p_loop, toks, CFG)
    out_scan = dec.decoder_forward(p_scan, toks, cfg_scan)
    np.testing.assert_allclose(np.asarray(out_loop), np.asarray(out_scan),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_remat_matches_plain():
    cfg_remat = dataclasses.replace(CFG, remat=True)
    p = _params()
    toks = jax.random.randint(jax.random.PRNGKey(1), (1, 8), 0, CFG.vocab_size)

    def loss(params, cfg):
        return jnp.sum(dec.decoder_forward(params, toks, cfg) ** 2)

    l0, g0 = jax.value_and_grad(loss)(p, CFG)
    l1, g1 = jax.value_and_grad(loss)(p, cfg_remat)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                atol=1e-5, rtol=1e-5), g0, g1)


def test_multiway_doubles_layer_params():
    """multiway=True duplicates every layer-internal projection/LN
    (reference layout parity, SURVEY.md §2.6 'Multiway')."""
    cfg_mw = dataclasses.replace(CFG, multiway=True)
    p_sw = _params()
    p_mw = dec.init_decoder(jax.random.PRNGKey(0), cfg_mw)
    sw_layer = param_count(p_sw["layers"][0])
    mw_layer = param_count(p_mw["layers"][0])
    assert mw_layer == 2 * sw_layer


@pytest.mark.slow
def test_multiway_default_routes_expert_a():
    """With no split position every token uses expert A — forcing expert B's
    params to garbage must not change the output."""
    cfg_mw = dataclasses.replace(CFG, multiway=True)
    p = dec.init_decoder(jax.random.PRNGKey(0), cfg_mw)
    toks = jax.random.randint(jax.random.PRNGKey(1), (1, 12), 0, CFG.vocab_size)
    out1 = dec.decoder_forward(p, toks, cfg_mw)

    def smash_b(path, leaf):
        names = [str(getattr(q, "key", "")) for q in path]
        return jnp.full_like(leaf, 1e9) if "B" in names else leaf

    p2 = jax.tree_util.tree_map_with_path(smash_b, p)
    out2 = dec.decoder_forward(p2, toks, cfg_mw)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))


@pytest.mark.slow
def test_kv_cache_decode_matches_full_forward():
    """Autoregressive decode through init_cache must reproduce the full
    (teacher-forced) forward logits step by step — including xPos."""
    p = _params()
    toks = jax.random.randint(jax.random.PRNGKey(2), (2, 10), 0, CFG.vocab_size)
    full = dec.decoder_forward(p, toks, CFG)

    caches = dec.init_cache(CFG, batch=2, max_len=16)
    outs = []
    for t in range(10):
        x, _ = dec.forward_embedding(p, CFG, toks[:, t:t + 1], offset=t)
        h, caches = dec.run_layers(p, x, CFG, caches=caches,
                                   cache_index=jnp.full((2,), t, jnp.int32))
        outs.append(dec.output_logits(p, h, CFG))
    step = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(step), np.asarray(full),
                               atol=2e-3, rtol=2e-3)


def test_embed_scale_applied_once():
    """forward_embedding returns (scaled+pos, scaled) per torchscale
    semantics (SURVEY.md §3.1)."""
    p = _params()
    toks = jnp.array([[5, 7]], jnp.int32)
    x, embed = dec.forward_embedding(p, CFG, toks)
    raw = p["embed"]["table"][jnp.array([5, 7])]
    np.testing.assert_allclose(np.asarray(embed[0]),
                               np.asarray(raw * CFG.embed_scale), rtol=1e-6)
    # x adds learned positions on top
    from kosmosx_tpu.nn import layers
    pos = layers.positional_embedding(p["pos"], 2, padding_idx=CFG.padding_idx)
    np.testing.assert_allclose(np.asarray(x[0]),
                               np.asarray(raw * CFG.embed_scale + pos), rtol=1e-6)


@pytest.mark.slow
def test_padding_segment_ids_mask_attention():
    """Padded positions must not influence earlier (causal) real positions;
    real-token logits must match the unpadded run."""
    p = _params()
    toks = jax.random.randint(jax.random.PRNGKey(3), (1, 8), 2, CFG.vocab_size)
    seg = jnp.where(jnp.arange(8)[None] < 6, 0, -1).astype(jnp.int32)
    toks_padded = jnp.where(seg == 0, toks, CFG.padding_idx)
    out_masked = dec.decoder_forward(p, toks_padded, CFG, segment_ids=seg)
    out_short = dec.decoder_forward(p, toks_padded[:, :6], CFG)
    np.testing.assert_allclose(np.asarray(out_masked[:, :6]),
                               np.asarray(out_short), atol=1e-4, rtol=1e-4)


def test_position_overflow_raises():
    """Sequences beyond the learned position table raise at trace time
    instead of silently gathering NaN (reference defect SURVEY.md §2.6.3:
    a 2048-entry table with seq-8192 training config)."""
    p = _params()
    max_len = CFG.max_positions - CFG.padding_idx - 1  # usable length
    toks_ok = jnp.zeros((1, max_len), jnp.int32)
    logits = dec.decoder_forward(p, toks_ok, CFG)
    assert bool(jnp.all(jnp.isfinite(logits)))
    toks_bad = jnp.zeros((1, max_len + 1), jnp.int32)
    with pytest.raises(ValueError, match="max_positions"):
        dec.decoder_forward(p, toks_bad, CFG)


@pytest.mark.parametrize("policy", [
    pytest.param("nothing", marks=pytest.mark.slow),
    pytest.param("dots", marks=pytest.mark.slow), "dots_no_batch"])
def test_remat_policies_grads_match(policy):
    """Every remat policy recomputes to bit-identical gradients."""
    base = dataclasses.replace(CFG, dropout=0.0, attention_dropout=0.0)
    p = _params(base)
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 4, base.vocab_size)

    def loss(cfg):
        return lambda pp: jnp.sum(
            dec.decoder_forward(pp, toks, cfg).astype(jnp.float32) ** 2)

    g0 = jax.grad(loss(base))(p)
    cfg = dataclasses.replace(base, remat=True, remat_policy=policy)
    g1 = jax.grad(loss(cfg))(p)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_int8_kv_cache_tracks_fp_cache():
    """Decode with an int8 KV cache (cfg.kv_cache_dtype) must track the
    full-precision cache logits closely, and greedy decode from a real
    prompt should be token-identical at this scale."""
    import dataclasses

    cfg_q = dataclasses.replace(CFG, kv_cache_dtype="int8")
    p = _params()
    toks = jax.random.randint(jax.random.PRNGKey(4), (2, 10), 2,
                              CFG.vocab_size)

    def decode_all(cfg):
        caches = dec.init_cache(cfg, batch=2, max_len=16)
        outs = []
        for t in range(10):
            x, _ = dec.forward_embedding(p, cfg, toks[:, t:t + 1], offset=t)
            h, caches = dec.run_layers(p, x, cfg, caches=caches,
                                       cache_index=jnp.full((2,), t,
                                                            jnp.int32))
            outs.append(dec.output_logits(p, h, cfg))
        return jnp.concatenate(outs, axis=1)

    fp = np.asarray(decode_all(CFG))
    q8 = np.asarray(decode_all(cfg_q))
    # int8 cache: small numeric divergence, same rankings at tiny scale
    err = np.abs(q8 - fp).max() / (np.abs(fp).max() + 1e-9)
    assert err < 0.05, err
    np.testing.assert_array_equal(q8.argmax(-1), fp.argmax(-1))


def test_int8_kv_cache_generate_and_serve():
    """generate_text and the serving engine run with kv_cache_dtype=int8
    (cache pytree has the scale leaves; slot insert / donation work)."""
    import dataclasses

    from kosmosx_tpu.generate import SamplingConfig, generate_text
    from kosmosx_tpu.serve import ServeConfig, ServeEngine

    cfg_q = dataclasses.replace(CFG, scan_layers=True,
                                kv_cache_dtype="int8")
    p = dec.init_decoder(jax.random.PRNGKey(0), cfg_q)
    prompt = jnp.asarray([[3, 5, 7, 9]], jnp.int32)
    out = generate_text(p, cfg_q, prompt,
                        SamplingConfig(max_new_tokens=6, greedy=True))
    assert out.shape == (1, 6)

    eng = ServeEngine(p, cfg_q,
                      ServeConfig(max_batch=2, max_prompt_len=8, max_len=32),
                      SamplingConfig(greedy=True))
    h = eng.submit([3, 5, 7, 9], max_new_tokens=6)
    eng.run()
    assert h.done and len(h.tokens) == 6
    # int8 greedy tokens match the fp-cache engine at this scale
    cfg_fp = dataclasses.replace(cfg_q, kv_cache_dtype=None)
    eng2 = ServeEngine(p, cfg_fp,
                       ServeConfig(max_batch=2, max_prompt_len=8,
                                   max_len=32),
                       SamplingConfig(greedy=True))
    h2 = eng2.submit([3, 5, 7, 9], max_new_tokens=6)
    eng2.run()
    assert h.tokens == h2.tokens
