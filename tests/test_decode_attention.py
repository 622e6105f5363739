"""Pallas decode-attention kernel (ops/decode_attention.py) vs the einsum
oracle, and end-to-end through the decode path (`decode_attn_kernel=True`).

The kernel replaces the M=1 cached-attention einsums of the decode step
(nn/attention.py) — see BASELINE.md's decode S-sweep for why. CPU runs use
interpret mode (tests/conftest.py); on-chip numbers live in
benchmarks/decode_attn_study.py.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kosmosx_tpu.ops.decode_attention import (decode_attention,
                                              decode_attention_reference)


def _rand(key, shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, jnp.float32).astype(dtype)


def _quantize(x):
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    codes = jnp.clip(jnp.round(x.astype(jnp.float32) / scale),
                     -127, 127).astype(jnp.int8)
    return codes, scale


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 1e-5),
                                       (jnp.bfloat16, 2e-2)])
def test_kernel_matches_oracle(dtype, tol):
    key = jax.random.PRNGKey(0)
    b, h, s, hd = 3, 4, 256, 64
    ks = jax.random.split(key, 3)
    q = _rand(ks[0], (b, h, 1, hd), dtype)
    k = _rand(ks[1], (b, h, s, hd), dtype)
    v = _rand(ks[2], (b, h, s, hd), dtype)
    kv_len = jnp.array([s, 100, 1], jnp.int32)
    ref = decode_attention_reference(q, k, v, kv_len)
    out = decode_attention(q, k, v, kv_len, block_s=64, interpret=True)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                - ref.astype(jnp.float32))))
    assert err < tol, err


def test_kernel_int8_cache_matches_oracle():
    key = jax.random.PRNGKey(1)
    b, h, s, hd = 2, 4, 128, 64
    ks = jax.random.split(key, 3)
    q = _rand(ks[0], (b, h, 1, hd))
    kq, ksc = _quantize(_rand(ks[1], (b, h, s, hd)))
    vq, vsc = _quantize(_rand(ks[2], (b, h, s, hd)))
    ref = decode_attention_reference(q, kq, vq, jnp.array([s, 40]),
                                     k_scale=ksc, v_scale=vsc)
    out = decode_attention(q, kq, vq, jnp.array([s, 40]),
                           k_scale=ksc, v_scale=vsc,
                           block_s=64, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_kernel_block_shrink_and_empty_row():
    """Non-power-of-two cache lengths auto-shrink the block; kv_len=0 rows
    return zeros (the guarded-softmax contract of the einsum path)."""
    key = jax.random.PRNGKey(2)
    b, h, s, hd = 2, 2, 136, 64  # 136 = 8*17: valid, not a block multiple
    ks = jax.random.split(key, 3)
    q = _rand(ks[0], (b, h, 1, hd))
    k = _rand(ks[1], (b, h, s, hd))
    v = _rand(ks[2], (b, h, s, hd))
    kv_len = jnp.array([0, s], jnp.int32)
    out = decode_attention(q, k, v, kv_len, interpret=True)
    ref = decode_attention_reference(q, k, v, kv_len)
    assert bool(jnp.all(out[0] == 0))
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(ref[1]),
                               atol=1e-5, rtol=1e-5)


def test_kernel_rejects_multi_query():
    key = jax.random.PRNGKey(3)
    q = _rand(key, (1, 2, 4, 64))
    k = v = _rand(key, (1, 2, 64, 64))
    with pytest.raises(ValueError, match="single-query"):
        decode_attention(q, k, v, jnp.array([64]), interpret=True)


# ---------------------------------------------------------------------------
# End-to-end: config flag through the decode path
# ---------------------------------------------------------------------------

def _tiny_cfg(**kw):
    from kosmosx_tpu.core.config import MagnetoConfig
    kw.setdefault("scan_layers", False)
    return MagnetoConfig(layers=2, embed_dim=64, ffn_dim=128, heads=2,
                         vocab_size=97, max_positions=128,
                         dropout=0.0, attention_dropout=0.0,
                         use_flash_attention=False,
                         multiway=False, **kw)


@pytest.mark.parametrize("kv8", [False, True])
def test_generate_matches_einsum_path(kv8):
    """Greedy generation with the kernel is token-identical to the einsum
    decode path (same model, same prompt), bf16-free fp32 run."""
    from kosmosx_tpu.core.dtypes import init_casted
    from kosmosx_tpu.generate import SamplingConfig, generate_text
    from kosmosx_tpu.nn import decoder as dec

    base = _tiny_cfg(kv_cache_dtype="int8" if kv8 else None)
    fast = dataclasses.replace(base, decode_attn_kernel=True)
    params = init_casted(lambda k: dec.init_decoder(k, base),
                         jax.random.PRNGKey(0), base.dtype)
    prompt = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 4, 97,
                                jnp.int32)
    s = SamplingConfig(max_new_tokens=8, greedy=True)
    ref = generate_text(params, base, prompt, s, interpret=True)
    out = generate_text(params, fast, prompt, s, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_engine_fill_heuristic_matches_plain():
    """ServeConfig.decode_kernel_fill: low-fill dispatches on a long pool
    route through the Pallas kernel cfg, high-fill dispatches fall back to
    the einsum path, and greedy outputs equal the plain engine's."""
    from kosmosx_tpu.generate import SamplingConfig
    from kosmosx_tpu.nn import decoder as dec
    from kosmosx_tpu.serve import ServeConfig, ServeEngine

    base = _tiny_cfg(scan_layers=True)
    params = dec.init_decoder(jax.random.PRNGKey(0), base)
    scfg = ServeConfig(max_batch=2, max_prompt_len=16, max_len=1024)
    plain = ServeEngine(params, base, scfg, SamplingConfig(greedy=True))
    auto = ServeEngine(params, base,
                       dataclasses.replace(scfg, decode_kernel_fill=0.5),
                       SamplingConfig(greedy=True), interpret=True)
    # fresh slots sit far below 50% fill of the 1024 pool: kernel selected
    assert auto._decode_cfg([True, False]).decode_attn_kernel
    # a pool past the threshold falls back to the einsum cfg
    auto._dispatched[0] = 900
    assert not auto._decode_cfg([True, False]).decode_attn_kernel
    auto._dispatched[0] = 0
    # a short pool never uses the kernel regardless of fill
    short = ServeEngine(params, base,
                        dataclasses.replace(scfg, max_len=256,
                                            decode_kernel_fill=0.5),
                        SamplingConfig(greedy=True), interpret=True)
    assert not short._decode_cfg([True, False]).decode_attn_kernel
    prompts = ([5, 9, 2, 44], [7, 3])
    outs = []
    for eng in (plain, auto):
        hs = [eng.submit(list(p), max_new_tokens=8) for p in prompts]
        eng.run()
        outs.append([h.tokens for h in hs])
    assert outs[0] == outs[1]


def test_generate_kv_window_matches_einsum_path():
    """Ring-buffer (kv_window) decode composes with the kernel: kv_len
    masking covers the ring contract (all written slots are older)."""
    from kosmosx_tpu.core.dtypes import init_casted
    from kosmosx_tpu.generate import SamplingConfig, generate_text
    from kosmosx_tpu.nn import decoder as dec

    base = _tiny_cfg(kv_window=24, kv_sink=4)
    fast = dataclasses.replace(base, decode_attn_kernel=True)
    params = init_casted(lambda k: dec.init_decoder(k, base),
                         jax.random.PRNGKey(0), base.dtype)
    prompt = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 4, 97,
                                jnp.int32)
    s = SamplingConfig(max_new_tokens=24, greedy=True)  # generates past wrap
    ref = generate_text(params, base, prompt, s, interpret=True)
    out = generate_text(params, fast, prompt, s, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))
