"""Mixture-of-experts FFN + expert parallelism (nn/moe.py).

Beyond-parity capability (SURVEY.md §2.3 "Expert parallel / MoE"; the
reference's only expert structure is the static multiway split). Covers:
routing correctness against a dense oracle, capacity-drop semantics, aux
loss, decoder integration (scan + non-scan, grads, generation with KV
cache), expert-parallel sharded execution on the 8-device mesh, and a
sharded MoE train step.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kosmosx_tpu.core.config import MagnetoConfig
from kosmosx_tpu.nn import decoder as dec
from kosmosx_tpu.nn.moe import (init_moe_ffn, moe_capacity, moe_ffn,
                                moe_ffn_dense_oracle)
from kosmosx_tpu.parallel.mesh import make_mesh
from kosmosx_tpu.parallel.sharding import param_specs, shard_params

MOE_CFG = MagnetoConfig(vocab_size=64, embed_dim=32, ffn_dim=64, layers=2,
                        heads=4, max_positions=64, use_flash_attention=False,
                        multiway=False, dropout=0.0, attention_dropout=0.0,
                        moe_experts=4, moe_top_k=2)


def _params(key=0, d=16, f=32, e=4, subln=True):
    return init_moe_ffn(jax.random.PRNGKey(key), d, f, e, subln=subln)


def test_moe_matches_dense_oracle_with_ample_capacity():
    """capacity_factor = E guarantees no drops -> routed output must equal
    the dense every-token-through-its-top-k-experts oracle."""
    d, f, e = 16, 32, 4
    params = _params(d=d, f=f, e=e)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, d))
    y, aux = moe_ffn(params, x, num_experts=e, top_k=2, capacity_factor=e)
    ref = moe_ffn_dense_oracle(params, x, num_experts=e, top_k=2)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
    assert np.isfinite(float(aux)) and float(aux) > 0


def test_moe_top1_matches_oracle():
    d, f, e = 16, 32, 4
    params = _params(key=3, d=d, f=f, e=e, subln=False)
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 6, d))
    y, _ = moe_ffn(params, x, num_experts=e, top_k=1, capacity_factor=e)
    ref = moe_ffn_dense_oracle(params, x, num_experts=e, top_k=1)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_moe_capacity_overflow_drops_to_zero():
    """E=1/top-1 with capacity 1: only the first token per batch row gets a
    slot; every later token's FFN output is exactly zero (residual
    pass-through semantics)."""
    d = 8
    params = _params(key=5, d=d, f=16, e=1)
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 5, d))
    assert moe_capacity(5, 1, 1, 0.05) == 1
    y, _ = moe_ffn(params, x, num_experts=1, top_k=1, capacity_factor=0.05)
    y = np.asarray(y)
    assert np.abs(y[:, 0]).max() > 0          # first token served
    np.testing.assert_array_equal(y[:, 1:], 0)  # the rest dropped


def test_moe_aux_weights_zero_out():
    params = _params(key=7)
    x = jax.random.normal(jax.random.PRNGKey(8), (1, 8, 16))
    _, aux = moe_ffn(params, x, num_experts=4, top_k=2,
                     aux_weight=0.0, z_weight=0.0)
    assert float(aux) == 0.0


def test_moe_load_balance_is_one_when_uniform():
    """Zero router weights -> uniform probs; lb term = E * sum(f * 1/E) = 1
    regardless of the (tie-broken) assignment, so aux = aux_weight * 1 +
    z_weight * log(E)^2 exactly."""
    params = _params(key=9, d=16, f=32, e=4)
    params["router"]["w"] = jnp.zeros_like(params["router"]["w"])
    x = jax.random.normal(jax.random.PRNGKey(10), (1, 8, 16))
    _, aux = moe_ffn(params, x, num_experts=4, top_k=2,
                     aux_weight=1.0, z_weight=0.0)
    np.testing.assert_allclose(float(aux), 1.0, rtol=1e-6)
    _, auxz = moe_ffn(params, x, num_experts=4, top_k=2,
                      aux_weight=0.0, z_weight=1.0)
    np.testing.assert_allclose(float(auxz), float(np.log(4.0) ** 2),
                               rtol=1e-5)


@pytest.mark.parametrize("scan", [
    pytest.param(False, marks=pytest.mark.slow), True])
def test_decoder_forward_moe(scan):
    cfg = MOE_CFG if not scan else \
        dataclasses.replace(MOE_CFG, scan_layers=True)
    params = dec.init_decoder(jax.random.PRNGKey(0), cfg)
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 12), 0,
                              cfg.vocab_size)
    logits, aux = dec.decoder_forward(params, toks, cfg, with_aux=True)
    assert logits.shape == (2, 12, cfg.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()
    assert float(aux) > 0
    # dense two-tuple contract unchanged
    logits2 = dec.decoder_forward(params, toks, cfg)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits2),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_moe_grads_flow_to_all_experts():
    """top_k = E = 2: every expert sees every token, so every expert weight
    and the router must receive a nonzero gradient."""
    cfg = dataclasses.replace(MOE_CFG, moe_experts=2, moe_top_k=2)
    params = dec.init_decoder(jax.random.PRNGKey(0), cfg)
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0, cfg.vocab_size)

    def loss(p):
        logits, aux = dec.decoder_forward(p, toks, cfg, with_aux=True)
        return logits.astype(jnp.float32).mean() + aux

    grads = jax.grad(loss)(params)
    for li in range(cfg.layers):
        g = grads["layers"][li]["ffn"]
        assert float(jnp.abs(g["router"]["w"]).max()) > 0
        for e in range(2):
            assert float(jnp.abs(g["experts"]["fc1"]["w"][e]).max()) > 0
            assert float(jnp.abs(g["experts"]["fc2"]["w"][e]).max()) > 0


def test_moe_generation_with_cache():
    """KV-cache decode works through the MoE FFN (decode = 1 token/group)."""
    from kosmosx_tpu.generate import SamplingConfig, generate_text
    params = dec.init_decoder(jax.random.PRNGKey(0), MOE_CFG)
    prompt = jax.random.randint(jax.random.PRNGKey(2), (2, 5), 2,
                                MOE_CFG.vocab_size)
    out = generate_text(params, MOE_CFG, prompt,
                        SamplingConfig(max_new_tokens=4, greedy=True))
    assert out.shape == (2, 4)
    assert np.asarray(out).max() < MOE_CFG.vocab_size


def test_moe_param_specs():
    params = dec.init_decoder(jax.random.PRNGKey(0), MOE_CFG)
    specs = param_specs(params)
    from jax.sharding import PartitionSpec as P
    ffn = specs["layers"][0]["ffn"]
    assert ffn["experts"]["fc1"]["w"] == P("expert", "fsdp", "tensor")
    assert ffn["experts"]["fc2"]["w"] == P("expert", "tensor", "fsdp")
    assert ffn["experts"]["fc1"]["b"] == P("expert", "tensor")
    assert ffn["experts"]["fc2"]["b"] == P("expert", None)
    assert ffn["experts"]["ffn_ln"]["scale"] == P("expert", "tensor")
    assert ffn["router"]["w"] == P("fsdp", None)


@pytest.mark.slow
def test_moe_expert_parallel_matches_single_device(devices):
    """Forward over a mesh with expert=4: expert weights are physically
    sharded over the expert axis and the result matches unsharded."""
    mesh = make_mesh(data=2, fsdp=1, tensor=1, expert=4)
    params = dec.init_decoder(jax.random.PRNGKey(0), MOE_CFG)
    toks = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0,
                              MOE_CFG.vocab_size)
    ref = dec.decoder_forward(params, toks, MOE_CFG)
    with mesh:
        sharded = shard_params(params, mesh)
        fc1 = sharded["layers"][0]["ffn"]["experts"]["fc1"]["w"]
        # 4 experts over a 4-way expert axis -> 1 expert per shard
        assert fc1.addressable_shards[0].data.shape[0] == 1
        out = jax.jit(lambda p, t: dec.decoder_forward(p, t, MOE_CFG))(
            sharded, toks)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_kosmos_multimodal_moe_with_aux():
    """The multimodal composition trains with an MoE decoder: Kosmos.apply
    returns (logits, aux) and kosmos_loss_fn folds aux into the loss."""
    from kosmosx_tpu.core.config import (KosmosConfig, ResamplerConfig,
                                         VisionConfig)
    from kosmosx_tpu.models.kosmos import Kosmos
    from kosmosx_tpu.train.trainer import kosmos_loss_fn

    kcfg = KosmosConfig(
        decoder=dataclasses.replace(MOE_CFG, embed_dim=32, max_positions=128),
        vision=VisionConfig(image_size=28, patch_size=14, hidden_dim=16,
                            layers=1, heads=2, mlp_dim=32,
                            use_flash_attention=False),
        resampler=ResamplerConfig(dim=16, depth=1, dim_head=8, heads=2,
                                  num_latents=4, num_media_embeds=5),
        image_embed_len=4)
    params = Kosmos.init(jax.random.PRNGKey(0), kcfg)
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 10), 2,
                              kcfg.decoder.vocab_size)
    imgs = jax.random.normal(jax.random.PRNGKey(2), (2, 3, 28, 28))
    logits, aux = Kosmos.apply(params, toks, imgs, kcfg, with_aux=True)
    assert logits.shape[0] == 2 and float(aux) > 0
    loss, metrics = kosmos_loss_fn(kcfg)(
        params, {"text_tokens": toks, "images": imgs}, None)
    assert "moe_aux" in metrics and np.isfinite(float(loss))


def test_moe_sharded_train_step_decreases_loss(devices):
    from kosmosx_tpu.train.data import synthetic_text_batches
    from kosmosx_tpu.train.trainer import TrainConfig, Trainer, lm_loss_fn
    cfg = MOE_CFG
    tcfg = TrainConfig(batch_size=4, seq_len=16, learning_rate=1e-3,
                       optimizer="adamw", schedule="constant",
                       total_steps=10, warmup_steps=1, checkpoint_every=0,
                       log_every=1000, data=2, fsdp=2, tensor=1, expert=2)
    trainer = Trainer(init_fn=lambda key: dec.init_decoder(key, cfg),
                      loss_fn=lm_loss_fn(cfg), cfg=tcfg)
    batches = list(synthetic_text_batches(batch_size=4, seq_len=16,
                                          vocab_size=cfg.vocab_size, steps=8))
    state, metrics = trainer.run(iter(batches))
    assert "moe_aux" in metrics
    loss_fn = lm_loss_fn(cfg)
    l0, _ = loss_fn(jax.device_get(state["params"]), batches[0],
                    jax.random.PRNGKey(0))
    init_params = dec.init_decoder(jax.random.PRNGKey(tcfg.seed), cfg)
    li, _ = loss_fn(init_params, batches[0], jax.random.PRNGKey(0))
    assert float(l0) < float(li), (float(l0), float(li))


def test_moe_padding_independence():
    """Pads must route NOWHERE (zero output, zero capacity) and with
    no_drop inference buffers a token's output must not depend on how much
    padding sits in its group — the serving-prefill invariant."""
    from kosmosx_tpu.nn.moe import moe_ffn

    key = jax.random.PRNGKey(3)
    D, E = 16, 4
    params = init_moe_ffn(key, D, 32, E)
    x_real = jax.random.normal(jax.random.fold_in(key, 1), (2, 5, D))
    y_real, _ = moe_ffn(params, x_real, num_experts=E, top_k=2,
                        valid=jnp.ones((2, 5), bool), no_drop=True)
    for pad in (3, 11):
        x_pad = jnp.concatenate(
            [x_real, jnp.zeros((2, pad, D), x_real.dtype)], axis=1)
        valid = jnp.concatenate(
            [jnp.ones((2, 5), bool), jnp.zeros((2, pad), bool)], axis=1)
        y_pad, _ = moe_ffn(params, x_pad, num_experts=E, top_k=2,
                           valid=valid, no_drop=True)
        np.testing.assert_allclose(np.asarray(y_pad[:, :5]),
                                   np.asarray(y_real), atol=1e-5)
        # pad positions produce exactly zero (residual pass-through)
        assert float(jnp.abs(y_pad[:, 5:]).max()) == 0.0


def test_moe_serving_matches_one_shot_generation():
    """The serving engine pads prompts to max_prompt_len; with pad-masked
    no-drop routing its greedy tokens must equal unpadded generate_text
    (this was a real bug: pads consumed expert capacity)."""
    from kosmosx_tpu.generate import SamplingConfig, generate_text
    from kosmosx_tpu.serve import ServeConfig, ServeEngine

    cfg = dataclasses.replace(MOE_CFG, scan_layers=True)
    params = dec.init_decoder(jax.random.PRNGKey(0), cfg)
    for p in ([5, 9, 2, 33], [7, 3, 5, 22, 8, 11, 40]):
        ref = generate_text(params, cfg, jnp.asarray([p], jnp.int32),
                            SamplingConfig(max_new_tokens=6, greedy=True))
        eng = ServeEngine(params, cfg,
                          ServeConfig(max_batch=2, max_prompt_len=16,
                                      max_len=48),
                          SamplingConfig(greedy=True))
        h = eng.submit(p, max_new_tokens=6)
        eng.run()
        assert h.tokens == [int(t) for t in np.asarray(ref[0])], p
