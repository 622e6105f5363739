"""Pipeline parallelism (parallel/pipeline.py) on the 8-device CPU mesh.

The oracle is single-device training: the GPipe-scheduled step must produce
the SAME loss and the SAME post-update params as a plain full-batch
``decoder_forward`` + CE step (the schedule/microbatching is pure
reorganization of the math). The reference has no pipeline parallelism at
all (SURVEY.md §2.3).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import PartitionSpec as P

from kosmosx_tpu.core.config import MagnetoConfig
from kosmosx_tpu.nn import decoder as dec
from kosmosx_tpu.parallel import (make_pipeline_train_step, make_pp_mesh,
                                  pipeline_state_specs, shift_labels)

CFG = MagnetoConfig(vocab_size=89, embed_dim=64, ffn_dim=128, layers=4,
                    heads=4, max_positions=1024, multiway=True,
                    dropout=0.0, attention_dropout=0.0, scan_layers=True,
                    use_flash_attention=True, flash_block_q=128,
                    flash_block_kv=128)


def _batch(batch=8, seq=128, seed=1):
    tokens = jax.random.randint(jax.random.PRNGKey(seed), (batch, seq), 4,
                                CFG.vocab_size, jnp.int32)
    labels, weights = shift_labels(tokens, CFG.padding_idx)
    return tokens, labels, weights


def _ref_loss_and_grads(params, tokens, labels, weights):
    def ref_loss(p):
        logits = dec.decoder_forward(p, tokens, CFG,
                                     interpret=True).astype(jnp.float32)
        logz = jax.scipy.special.logsumexp(logits, axis=-1)
        true = jnp.take_along_axis(logits, labels[..., None], -1)[..., 0]
        nll = (logz - true) * weights
        return jnp.sum(nll) / jnp.maximum(jnp.sum(weights), 1.0)

    return jax.value_and_grad(ref_loss)(params)


@pytest.mark.parametrize("data,pipe,microbatches", [
    pytest.param(2, 4, 2, marks=pytest.mark.slow),  # dp x pp, bubble (M < S)
    pytest.param(1, 4, 8, marks=pytest.mark.slow),  # deep microbatching (M > S)
    pytest.param(4, 2, 2, marks=pytest.mark.slow),  # 1F1B keeps fast coverage
])
def test_pipeline_step_matches_single_device(devices, data, pipe,
                                             microbatches):
    mesh = make_pp_mesh(data=data, pipe=pipe,
                        devices=jax.devices()[:data * pipe])
    params = dec.init_decoder(jax.random.PRNGKey(0), CFG)
    tokens, labels, weights = _batch(batch=8)

    opt = optax.sgd(0.1)
    step = make_pipeline_train_step(CFG, opt, mesh,
                                    microbatches=microbatches,
                                    interpret=True)
    state = {"params": params, "opt_state": opt.init(params)}
    new_state, loss = step(state, tokens, labels, weights)

    ref_l, ref_g = _ref_loss_and_grads(params, tokens, labels, weights)
    np.testing.assert_allclose(float(loss), float(ref_l), rtol=1e-5)
    ref_params = optax.apply_updates(
        params, opt.update(ref_g, opt.init(params), params)[0])
    for a, b in zip(jax.tree_util.tree_leaves(new_state["params"]),
                    jax.tree_util.tree_leaves(ref_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=5e-5)


@pytest.mark.slow
def test_pipeline_params_actually_sharded(devices):
    """Layer params and their Lion moments land sharded over the pipe axis;
    loss decreases over steps."""
    mesh = make_pp_mesh(data=2, pipe=4)
    params = dec.init_decoder(jax.random.PRNGKey(0), CFG)
    opt = optax.lion(1e-3)
    step = make_pipeline_train_step(CFG, opt, mesh, interpret=True)
    state = {"params": params, "opt_state": opt.init(params)}
    losses = []
    for i in range(4):
        tokens, labels, weights = _batch(seed=10 + i % 2)
        state, loss = step(state, tokens, labels, weights)
        losses.append(float(loss))
    assert losses[-1] < losses[0]

    w = state["params"]["layers"]["ffn"]["A"]["fc1"]["w"]
    spec = w.sharding.spec
    assert spec[0] == "pipe", spec
    mu = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map_with_path(
            lambda p, x: x if any(getattr(q, "key", None) == "layers"
                                  for q in p) else None,
            state["opt_state"], is_leaf=lambda x: x is None))
    assert any(getattr(x, "sharding", None) is not None
               and x.sharding.spec and x.sharding.spec[0] == "pipe"
               for x in mu if hasattr(x, "sharding"))


def test_pipeline_state_specs_shape():
    params = dec.init_decoder(jax.random.PRNGKey(0), CFG)
    opt = optax.lion(1e-3)
    state = {"params": params, "opt_state": opt.init(params)}
    specs = pipeline_state_specs(state)
    assert specs["params"]["layers"]["ffn"]["A"]["fc1"]["w"] == P("pipe")
    assert specs["params"]["embed"]["table"] == P()


def test_pipeline_validates_config(devices):
    mesh = make_pp_mesh(data=2, pipe=4)
    with pytest.raises(ValueError, match="scan_layers"):
        make_pipeline_train_step(
            dataclasses.replace(CFG, scan_layers=False), optax.sgd(0.1), mesh)
    with pytest.raises(ValueError, match="divisible"):
        make_pipeline_train_step(
            dataclasses.replace(CFG, layers=6), optax.sgd(0.1), mesh)
    with pytest.raises(ValueError, match="dropout"):
        make_pipeline_train_step(
            dataclasses.replace(CFG, dropout=0.1), optax.sgd(0.1), mesh)


# ---------------------------------------------------------------------------
# 1F1B schedule (VERDICT r1 weak #2)
# ---------------------------------------------------------------------------

from kosmosx_tpu.parallel.pipeline import make_pipeline_train_step_1f1b


@pytest.mark.parametrize("data,pipe,microbatches", [
    pytest.param(2, 4, 2, marks=pytest.mark.slow),    # M < S
    pytest.param(1, 4, 8, marks=pytest.mark.slow),    # M > S: stash reuse
    (4, 2, 2),                                        # the fast 1F1B smoke
])
def test_1f1b_matches_single_device(devices, data, pipe, microbatches):
    mesh = make_pp_mesh(data=data, pipe=pipe,
                        devices=jax.devices()[:data * pipe])
    params = dec.init_decoder(jax.random.PRNGKey(0), CFG)
    tokens, labels, weights = _batch(batch=8)

    opt = optax.sgd(0.1)
    step = make_pipeline_train_step_1f1b(CFG, opt, mesh,
                                         microbatches=microbatches,
                                         interpret=True)
    # tick/stash accounting: T = M + 2S - 2, stash = min(2S-1, M)
    assert step.num_ticks == microbatches + 2 * pipe - 2
    assert step.stash_slots == min(2 * pipe - 1, microbatches)

    state = {"params": params, "opt_state": opt.init(params)}
    new_state, loss = step(state, tokens, labels, weights)

    ref_l, ref_g = _ref_loss_and_grads(params, tokens, labels, weights)
    np.testing.assert_allclose(float(loss), float(ref_l), rtol=1e-5)
    ref_params = optax.apply_updates(
        params, opt.update(ref_g, opt.init(params), params)[0])
    for a, b in zip(jax.tree_util.tree_leaves(new_state["params"]),
                    jax.tree_util.tree_leaves(ref_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=5e-5)


@pytest.mark.slow
def test_1f1b_loss_decreases(devices):
    mesh = make_pp_mesh(data=2, pipe=4)
    params = dec.init_decoder(jax.random.PRNGKey(0), CFG)
    opt = optax.lion(1e-3)
    step = make_pipeline_train_step_1f1b(CFG, opt, mesh, microbatches=4,
                                         interpret=True)
    state = {"params": params, "opt_state": opt.init(params)}
    losses = []
    for i in range(4):
        tokens, labels, weights = _batch(seed=20 + i % 2)
        state, loss = step(state, tokens, labels, weights)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
