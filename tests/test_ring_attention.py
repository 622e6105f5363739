"""Ring flash attention (parallel/ring_attention.py) on the 8-device mesh.

Forward and backward parity against the full-sequence jnp oracle
(ops/flash_attention.mha_reference), causal and bidirectional, plus the
xPos-outside composition the docstring prescribes.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from kosmosx_tpu.ops.flash_attention import mha_reference
from kosmosx_tpu.parallel import ring_flash_attention

B, H, D = 2, 4, 64
S = 4            # sequence shards
LS = 128         # per-shard length (lane-aligned)
L = S * LS


def _mesh():
    devs = np.array(jax.devices()[:S]).reshape(S)
    return Mesh(devs, ("sequence",))


def _ring_full(q, k, v, *, causal):
    mesh = _mesh()
    fn = jax.shard_map(
        functools.partial(ring_flash_attention, axis_name="sequence",
                          causal=causal, block_q=LS, block_kv=LS,
                          interpret=True),
        mesh=mesh,
        in_specs=(P(None, None, "sequence", None),) * 3,
        out_specs=P(None, None, "sequence", None),
        check_vma=False)  # pallas_call carries no vma metadata
    return fn(q, k, v)


@pytest.mark.parametrize("causal", [True, False])
def test_ring_forward_matches_reference(devices, causal):
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, H, L, D)) * 0.5
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, H, L, D)) * 0.5
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, H, L, D))
    out = _ring_full(q, k, v, causal=causal)
    ref = mha_reference(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("causal", [True, False])
def test_ring_backward_matches_reference(devices, causal):
    key = jax.random.PRNGKey(3)
    q = jax.random.normal(key, (B, H, L, D)) * 0.5
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, H, L, D)) * 0.5
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, H, L, D))
    g = jax.random.normal(jax.random.fold_in(key, 3), (B, H, L, D))

    def loss_ring(q, k, v):
        return jnp.sum(_ring_full(q, k, v, causal=causal) * g)

    def loss_ref(q, k, v):
        return jnp.sum(mha_reference(q, k, v, causal=causal) * g)

    dq, dk, dv = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    rq, rk, rv = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in ((dq, rq, "dq"), (dk, rk, "dk"), (dv, rv, "dv")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3, err_msg=name)


def test_ring_with_xpos_outside(devices):
    """xPos applied per shard with global offsets == full-sequence xPos."""
    from kosmosx_tpu.nn.xpos import apply_xpos

    key = jax.random.PRNGKey(5)
    q = jax.random.normal(key, (B, H, L, D)) * 0.5
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, H, L, D)) * 0.5
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, H, L, D))
    # fixed center 0 so shard offsets compose (same convention as decode)
    qx = apply_xpos(q, scale_base=512, downscale=False, center=0)
    kx = apply_xpos(k, scale_base=512, downscale=True, center=0)
    ref = mha_reference(qx, kx, v, causal=True)

    mesh = _mesh()

    def shard_fn(q, k, v):
        i = jax.lax.axis_index("sequence")
        off = i * LS
        qx = apply_xpos(q, scale_base=512, downscale=False, center=0,
                        offset=off)
        kx = apply_xpos(k, scale_base=512, downscale=True, center=0,
                        offset=off)
        return ring_flash_attention(qx, kx, v, "sequence", causal=True,
                                    block_q=LS, block_kv=LS, interpret=True)

    fn = jax.shard_map(shard_fn, mesh=mesh,
                       in_specs=(P(None, None, "sequence", None),) * 3,
                       out_specs=P(None, None, "sequence", None),
                       check_vma=False)
    out = fn(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_ring_rejects_misaligned_shards(devices):
    mesh = _mesh()
    q = jnp.zeros((1, 2, S * 96, 32))  # 96-per-shard: not lane-aligned

    def bad(q):
        return ring_flash_attention(q, q, q, "sequence", interpret=True)

    fn = jax.shard_map(bad, mesh=mesh,
                       in_specs=(P(None, None, "sequence", None),),
                       out_specs=P(None, None, "sequence", None),
                       check_vma=False)
    with pytest.raises(ValueError, match="128"):
        fn(q)


# ---------------------------------------------------------------------------
# Sequence-parallel training step (parallel/seq_parallel.py)
# ---------------------------------------------------------------------------

import dataclasses

import optax

from kosmosx_tpu.core.config import MagnetoConfig
from kosmosx_tpu.nn import decoder as dec
from kosmosx_tpu.parallel import (make_seq_parallel_train_step, make_sp_mesh,
                                  shift_labels)

SP_CFG = MagnetoConfig(vocab_size=89, embed_dim=64, ffn_dim=128, layers=2,
                       heads=4, max_positions=1024, multiway=True,
                       dropout=0.0, attention_dropout=0.0, scan_layers=True,
                       use_flash_attention=True, flash_block_q=128,
                       flash_block_kv=128)


def test_seq_parallel_step_matches_single_device(devices):
    cfg_sp = dataclasses.replace(SP_CFG, sequence_axis="sequence")
    mesh = make_sp_mesh(data=2, sequence=4)
    ls, s = 128, 4
    L = ls * s
    params = dec.init_decoder(jax.random.PRNGKey(0), SP_CFG)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (4, L), 4,
                                SP_CFG.vocab_size, jnp.int32)
    labels, weights = shift_labels(tokens, SP_CFG.padding_idx)

    opt = optax.sgd(0.1)
    step = make_seq_parallel_train_step(cfg_sp, opt, mesh, interpret=True)
    state = {"params": params, "opt_state": opt.init(params)}
    new_state, loss = step(state, tokens, labels, weights)

    # single-device oracle: same loss definition on the full sequence
    def ref_loss(p):
        logits = dec.decoder_forward(p, tokens, SP_CFG,
                                     interpret=True).astype(jnp.float32)
        logz = jax.scipy.special.logsumexp(logits, axis=-1)
        true = jnp.take_along_axis(logits, labels[..., None], -1)[..., 0]
        nll = (logz - true) * weights
        return jnp.sum(nll) / jnp.maximum(jnp.sum(weights), 1.0)

    ref_l, ref_g = jax.value_and_grad(ref_loss)(params)
    np.testing.assert_allclose(float(loss), float(ref_l), rtol=1e-5,
                               atol=1e-5)
    ref_params = optax.apply_updates(
        params, opt.update(ref_g, opt.init(params), params)[0])
    flat_new = jax.tree_util.tree_leaves(new_state["params"])
    flat_ref = jax.tree_util.tree_leaves(ref_params)
    for a, b in zip(flat_new, flat_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)
