"""Cross-framework numerical parity: JAX decoder vs the torch oracle.

BASELINE.md's contract is logits within 1e-2 of the torch reference; this
pins the decoder math (embed-scale, learned positions, sub-LN placement,
xPos rotation+decay, fp32 softmax, erf-gelu, untied output projection)
against an independent torch implementation (tests/torch_oracle.py) at fp32,
where the frameworks should agree to ~1e-4.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from kosmosx_tpu.core.config import MagnetoConfig
from kosmosx_tpu.nn import decoder as dec
from tests.torch_oracle import decoder_forward_oracle

CFG = MagnetoConfig(vocab_size=97, embed_dim=32, ffn_dim=64, layers=3,
                    heads=4, max_positions=64, compute_dtype="float32",
                    multiway=True, subln=True, xpos_rel_pos=True,
                    use_flash_attention=False, scan_layers=False,
                    dropout=0.0, attention_dropout=0.0)


def _params_np(params):
    return jax.tree_util.tree_map(np.asarray, params)


@pytest.fixture(scope="module")
def setup():
    with jax.default_matmul_precision("highest"):
        params = dec.init_decoder(jax.random.PRNGKey(7), CFG)
        toks = jax.random.randint(jax.random.PRNGKey(3), (2, 17), 4,
                                  CFG.vocab_size, jnp.int32)
        ours = np.asarray(dec.decoder_forward(params, toks, CFG))
    return params, toks, ours


def test_logits_match_torch_oracle(setup, devices):
    params, toks, ours = setup
    ref = decoder_forward_oracle(_params_np(params), np.asarray(toks), CFG)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)


def test_parity_without_multiway_or_xpos(devices):
    cfg = dataclasses.replace(CFG, multiway=False, xpos_rel_pos=False)
    with jax.default_matmul_precision("highest"):
        params = dec.init_decoder(jax.random.PRNGKey(1), cfg)
        toks = jax.random.randint(jax.random.PRNGKey(2), (1, 11), 4,
                                  cfg.vocab_size, jnp.int32)
        ours = np.asarray(dec.decoder_forward(params, toks, cfg))
    ref = decoder_forward_oracle(_params_np(params), np.asarray(toks), cfg)
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)


def test_flash_path_matches_oracle(devices):
    """The Pallas flash path (interpret mode on CPU) must agree with the
    torch oracle end-to-end at a flash-eligible sequence length."""
    cfg = dataclasses.replace(CFG, use_flash_attention=True, max_positions=512)
    with jax.default_matmul_precision("highest"):
        params = dec.init_decoder(jax.random.PRNGKey(5), cfg)
        toks = jax.random.randint(jax.random.PRNGKey(6), (1, 256), 4,
                                  cfg.vocab_size, jnp.int32)
        ours = np.asarray(dec.decoder_forward(params, toks, cfg,
                                              interpret=True))
    ref = decoder_forward_oracle(_params_np(params), np.asarray(toks), cfg)
    np.testing.assert_allclose(ours, ref, atol=5e-3, rtol=5e-3)


def test_fast_gelu_holds_oracle_parity(devices):
    """activation="gelu_fast" (the purpose-fit polynomial erf-gelu,
    ops/fast_gelu.py) stays within the SAME 1e-4 fp32 parity bar against
    the torch oracle's libm erf-gelu — it is the same model, evaluated
    with a different (cheaper) erf implementation."""
    cfg = dataclasses.replace(CFG, activation="gelu_fast")
    with jax.default_matmul_precision("highest"):
        params = dec.init_decoder(jax.random.PRNGKey(7), cfg)
        toks = jax.random.randint(jax.random.PRNGKey(3), (2, 17), 4,
                                  cfg.vocab_size, jnp.int32)
        ours = np.asarray(dec.decoder_forward(params, toks, cfg))
    ref = decoder_forward_oracle(_params_np(params), np.asarray(toks), CFG)
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)
