"""Training stack: sharded pjit train step on the virtual 8-device mesh,
loss decrease, optimizer variants, decay masking, checkpoint round-trip."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from kosmosx_tpu.core.config import MagnetoConfig
from kosmosx_tpu.nn import decoder as dec
from kosmosx_tpu.parallel.mesh import make_mesh
from kosmosx_tpu.parallel.sharding import param_specs, shard_params
from kosmosx_tpu.train.data import (group_texts, packed_text_batches,
                                    synthetic_text_batches)
from kosmosx_tpu.train.loss import next_token_loss
from kosmosx_tpu.train.optim import make_optimizer, make_schedule, weight_decay_mask
from kosmosx_tpu.train.trainer import TrainConfig, Trainer, lm_loss_fn

CFG = MagnetoConfig(vocab_size=64, embed_dim=32, ffn_dim=64, layers=2,
                    heads=4, max_positions=64, use_flash_attention=False,
                    multiway=False, dropout=0.0, attention_dropout=0.0)


def test_next_token_loss_basic():
    logits = jnp.zeros((2, 5, 8))
    labels = jnp.ones((2, 5), jnp.int32)
    loss, m = next_token_loss(logits, labels)
    np.testing.assert_allclose(float(loss), np.log(8), rtol=1e-5)
    assert float(m["tokens"]) == 8  # (5-1) * 2


def test_loss_respects_mask():
    key = jax.random.PRNGKey(0)
    logits = jax.random.normal(key, (1, 6, 8))
    labels = jax.random.randint(jax.random.fold_in(key, 1), (1, 6), 0, 8)
    mask_full = jnp.ones((1, 6))
    mask_half = jnp.array([[1, 1, 1, 0, 0, 0]], jnp.float32)
    l_full, _ = next_token_loss(logits, labels, mask_full)
    l_half, _ = next_token_loss(logits, labels, mask_half)
    # masked loss computed only from the first 2 label positions
    l_manual, _ = next_token_loss(logits[:, :3], labels[:, :3])
    np.testing.assert_allclose(float(l_half), float(l_manual), rtol=1e-5)
    assert not np.isclose(float(l_full), float(l_half))


def test_weight_decay_mask_rules():
    params = dec.init_decoder(jax.random.PRNGKey(0), CFG)
    mask = weight_decay_mask(params)
    assert mask["embed"]["table"] is False
    assert mask["ln"]["scale"] is False
    assert mask["out_proj"]["w"] is True
    assert mask["layers"][0]["attn"]["q"]["w"] is True
    assert mask["layers"][0]["attn"]["q"]["b"] is False
    assert mask["layers"][0]["ffn"]["fc1"]["w"] is True


@pytest.mark.parametrize("opt_name", ["lion", "adamw", "stable_adamw"])
def test_optimizer_smoke(opt_name):
    params = {"w": jnp.ones((4, 4)), "ln": {"scale": jnp.ones((4,))}}
    opt = make_optimizer(opt_name, 1e-2, weight_decay=0.1)
    state = opt.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, state = opt.update(grads, state, params)
    new = optax.apply_updates(params, updates)
    assert not np.allclose(np.asarray(new["w"]), np.asarray(params["w"]))


def test_group_texts_packing():
    streams = [[1, 2, 3], [4, 5], [6, 7, 8, 9, 10]]
    blocks = list(group_texts(streams, seq_len=4, eos_id=0))
    flat = [t for s in streams for t in s + [0]]
    assert len(blocks) == len(flat) // 4
    np.testing.assert_array_equal(np.concatenate(blocks),
                                  np.asarray(flat[:len(blocks) * 4]))


@pytest.mark.slow
def test_trainer_loss_decreases_on_mesh(devices):
    """Full pjit train loop on the 8-device CPU mesh with fsdp+tensor
    sharding — the ZeRO/FSDP-equivalence check (SURVEY.md §2.3)."""
    tcfg = TrainConfig(batch_size=8, seq_len=32, learning_rate=3e-3,
                       optimizer="adamw", schedule="constant",
                       total_steps=60, warmup_steps=1, checkpoint_every=0,
                       log_every=1000, data=2, fsdp=2, tensor=2)
    trainer = Trainer(
        init_fn=lambda key: dec.init_decoder(key, CFG),
        loss_fn=lm_loss_fn(CFG),
        cfg=tcfg)
    batches = list(synthetic_text_batches(
        batch_size=8, seq_len=32, vocab_size=CFG.vocab_size, steps=40))
    state, metrics = trainer.run(iter(batches + batches), steps=40)
    first_loss = None
    # re-measure on the first batch
    loss_fn = lm_loss_fn(CFG)
    l0, _ = loss_fn(trainer.state["params"], trainer.shard_batch(batches[0]),
                    jax.random.PRNGKey(0))
    init_params = dec.init_decoder(jax.random.PRNGKey(tcfg.seed), CFG)
    li, _ = loss_fn(init_params, batches[0], jax.random.PRNGKey(0))
    assert float(l0) < float(li) * 0.9, (float(l0), float(li))


def test_checkpoint_roundtrip(tmp_path):
    from kosmosx_tpu.train import checkpoint as ckpt
    params = dec.init_decoder(jax.random.PRNGKey(0), CFG)
    state = {"params": params, "step": jnp.array(7, jnp.int32)}
    path = ckpt.save_checkpoint(state, str(tmp_path), 7)
    found = ckpt.latest_checkpoint(str(tmp_path))
    assert found is not None and found[1] == 7
    restored = ckpt.restore_checkpoint(found[0], state)
    assert int(restored["step"]) == 7
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        state["params"], restored["params"])


def test_param_specs_structure():
    params = dec.init_decoder(jax.random.PRNGKey(0), CFG)
    specs = param_specs(params)
    from jax.sharding import PartitionSpec as P
    assert specs["embed"]["table"] == P("fsdp", "tensor")
    assert specs["layers"][0]["attn"]["q"]["w"] == P("fsdp", "tensor")
    assert specs["layers"][0]["attn"]["out"]["w"] == P("tensor", "fsdp")
    assert specs["layers"][0]["ffn"]["fc2"]["w"] == P("tensor", "fsdp")
    assert specs["ln"]["scale"] == P()


def test_sharded_forward_matches_single_device(devices):
    """pjit-sharded forward == unsharded forward."""
    mesh = make_mesh(data=2, fsdp=2, tensor=2)
    params = dec.init_decoder(jax.random.PRNGKey(0), CFG)
    toks = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0, CFG.vocab_size)
    ref = dec.decoder_forward(params, toks, CFG)
    with mesh:
        sharded = shard_params(params, mesh)
        out = jax.jit(lambda p, t: dec.decoder_forward(p, t, CFG))(sharded, toks)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_trainer_resume_matches_continuous(devices, tmp_path):
    """Checkpoint at step 4, resume in a fresh Trainer, and land on exactly
    the same params as an uninterrupted 6-step run (the reference's
    save_state + skip_first_batches contract, train.py:618-668)."""
    out = str(tmp_path / "ckpts")

    def mk(resume):
        tcfg = TrainConfig(batch_size=4, seq_len=16, learning_rate=1e-3,
                           optimizer="adamw", schedule="constant",
                           total_steps=10, warmup_steps=1,
                           checkpoint_every=4, log_every=1000,
                           output_dir=out, resume=resume,
                           data=2, fsdp=2, tensor=2)
        return Trainer(init_fn=lambda key: dec.init_decoder(key, CFG),
                       loss_fn=lm_loss_fn(CFG), cfg=tcfg)

    batches = list(synthetic_text_batches(
        batch_size=4, seq_len=16, vocab_size=CFG.vocab_size, steps=6))

    # uninterrupted 6-step run
    cont = mk(resume=False)
    state_c, _ = cont.run(iter(batches), steps=6)

    # interrupted: 4 steps (writes step-4 checkpoint), then resume for 2 more
    part = mk(resume=False)
    part.run(iter(batches), steps=4)
    resumed = mk(resume=True)
    state_r, _ = resumed.run(iter(batches))

    assert int(state_r["step"]) == int(state_c["step"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=1e-5, atol=1e-6),
        state_c["params"], state_r["params"])


def test_multimodal_batches_collate(devices):
    """Raw {text, image} samples -> fixed-shape Kosmos training batches."""
    from kosmosx_tpu.data.tokenizer import KosmosTokenizer
    from kosmosx_tpu.train.data import multimodal_batches

    tok = KosmosTokenizer(use_hf=False, image_size=28)
    samples = [{"target_text": f"caption number {i}",
                "image": np.random.RandomState(i).randint(
                    0, 256, (3, 32, 32)).astype(np.uint8)}
               for i in range(5)]
    batches = list(multimodal_batches(iter(samples), tok,
                                      batch_size=2, text_len=24))
    assert len(batches) == 2  # 5 samples -> 2 full batches, remainder dropped
    b = batches[0]
    assert b["text_tokens"].shape == (2, 24)
    assert b["images"].shape == (2, 3, 28, 28)
    assert b["text_tokens"].dtype == np.int32
    # BOS then <image>, </image> tags spliced at the front
    assert b["text_tokens"][0, 0] == tok.bos_token_id
    assert b["text_tokens"][0, 1] == tok.im_idx
    assert b["text_tokens"][0, 2] == tok.im_end_idx


def test_hybrid_mesh_single_slice_fallback(devices):
    from kosmosx_tpu.parallel.mesh import make_hybrid_mesh
    mesh = make_hybrid_mesh(dcn_data=1, data=2, fsdp=2, tensor=2)
    assert mesh.axis_names == ("data", "fsdp", "tensor", "expert")
    assert mesh.devices.shape == (2, 2, 2, 1)


def test_multimodal_loss_boundary_alignment(devices):
    """The predictor of the first post-image token must be the LAST image
    slot, not the <image> token (regression: off-by-one dropped the wrong
    logit block)."""
    from kosmosx_tpu.train.loss import multimodal_next_token_loss

    v, s, k = 16, 2, 3
    text = jnp.array([[4, 5, 6, 7]], jnp.int32)       # [t0 t1 t2 t3]
    # spliced layout: [t0, t1, I, I, I, t2, t3] -> Lout = 7
    # correct predictors for labels [t1, t2, t3] = spliced positions [0, 4, 5]
    logits = jnp.full((1, 7, v), -10.0)
    logits = logits.at[0, 0, 5].set(10.0)   # pos 0 predicts t1=5
    logits = logits.at[0, 4, 6].set(10.0)   # pos 4 (last image) predicts t2=6
    logits = logits.at[0, 5, 7].set(10.0)   # pos 5 (t2) predicts t3=7
    loss, m = multimodal_next_token_loss(logits, text, k, s, pad_id=1)
    assert float(m["accuracy"]) == 1.0
    assert float(loss) < 0.01


@pytest.mark.slow
def test_train_cli_end_to_end(tmp_path):
    """scripts/train.py runs a few steps (synthetic data, checkpoint out)."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = tmp_path / "ckpt"
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "train.py"),
         "--model", "language", "--synthetic", "--layers", "1",
         "--dim", "32", "--ffn-dim", "64", "--heads", "2",
         "--vocab-size", "97", "--max-positions", "64",
         "--dtype", "float32", "--no-flash", "--batch-size", "2",
         "--seq-len", "16", "--steps", "6", "--log-every", "2",
         "--checkpoint-every", "4", "--output-dir", str(out_dir),
         "--optimizer", "adamw", "--data", "2"],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "JAX_PLATFORMS": "cpu", "HF_HUB_OFFLINE": "1",
             "XLA_FLAGS": "--xla_force_host_platform_device_count=2"})
    assert out.returncode == 0, (out.stderr[-2000:], out.stdout[-500:])
    assert (out_dir / "step_4").exists()  # reference checkpoints/step_{n}


def test_freeze_subtree(devices):
    """TrainConfig.freeze: frozen top-level subtrees pass through training
    bit-identical, get no optimizer state, and the rest still trains (the
    reference composes pretrained encoder towers as frozen feature
    extractors — the flagship use is freeze=('clip',))."""
    cfg = TrainConfig(batch_size=4, seq_len=16, total_steps=4,
                      learning_rate=1e-2, optimizer="adamw",
                      schedule="constant", checkpoint_every=0, log_every=100,
                      data=2, fsdp=2, tensor=2, freeze=("embed",))
    trainer = Trainer(init_fn=lambda k: dec.init_decoder(k, CFG),
                      loss_fn=lm_loss_fn(CFG), cfg=cfg)
    # snapshot the trainer's OWN initial params (the jitted sharded init is
    # not bit-identical to an eager init with the same key)
    state0 = trainer.init_state()
    embed0 = np.asarray(state0["params"]["embed"]["table"]).copy()
    out0 = np.asarray(state0["params"]["out_proj"]["w"]).copy()
    state, _ = trainer.run(synthetic_text_batches(
        batch_size=4, seq_len=16, vocab_size=CFG.vocab_size, steps=4),
        steps=4)
    # frozen subtree: bit-identical; trainable subtree: moved
    np.testing.assert_array_equal(np.asarray(state["params"]["embed"]["table"]),
                                  embed0)
    assert not np.allclose(np.asarray(state["params"]["out_proj"]["w"]), out0)
    # optimizer state holds ONLY the trainable subtree (no frozen moments)
    leaves = jax.tree_util.tree_leaves_with_path(state["opt_state"])
    assert not any("embed" in jax.tree_util.keystr(p) for p, _ in leaves)
    assert any("out_proj" in jax.tree_util.keystr(p) for p, _ in leaves)
    # unknown freeze keys fail loudly at construction time
    bad = TrainConfig(batch_size=4, seq_len=16, total_steps=1,
                      learning_rate=1e-2, optimizer="adamw",
                      schedule="constant", checkpoint_every=0, log_every=100,
                      data=2, fsdp=2, tensor=2, freeze=("nope",))
    t2 = Trainer(init_fn=lambda k: dec.init_decoder(k, CFG),
                 loss_fn=lm_loss_fn(CFG), cfg=bad)
    with pytest.raises(ValueError, match="freeze keys"):
        t2.init_state()


def test_trainer_eval_loop():
    """cfg.eval_every runs a forward-only validation pass whose metrics
    merge into the log line and whose execution leaves training untouched."""
    import jax.numpy as jnp

    cfg = TrainConfig(batch_size=4, seq_len=16, total_steps=6,
                      learning_rate=1e-3, optimizer="adamw",
                      schedule="constant", checkpoint_every=0, log_every=1,
                      eval_every=2, data=2, fsdp=2, tensor=2)
    trainer = Trainer(init_fn=lambda k: dec.init_decoder(k, CFG),
                      loss_fn=lm_loss_fn(CFG), cfg=cfg)

    def eval_batches():
        return synthetic_text_batches(batch_size=4, seq_len=16,
                                      vocab_size=CFG.vocab_size, steps=3,
                                      seed=999)

    logged = []
    trainer.run(synthetic_text_batches(batch_size=4, seq_len=16,
                                       vocab_size=CFG.vocab_size, steps=6),
                steps=6, log_fn=lambda s, m: logged.append((s, m)),
                eval_batches=eval_batches)
    with_eval = [m for _, m in logged if "eval_loss" in m]
    assert with_eval, "no eval metrics logged"
    assert all(np.isfinite(m["eval_loss"]) for m in with_eval)
    # eval is deterministic given fixed eval data + params snapshot; two
    # standalone calls agree
    e1 = trainer.evaluate(eval_batches())
    e2 = trainer.evaluate(eval_batches())
    assert e1["eval_loss"] == e2["eval_loss"]
    # eval_loss is the TRUE mean loss, not doubled by the metrics dict's
    # own "loss" entry (regression: both were summed)
    losses = []
    for b in eval_batches():
        l, _ = lm_loss_fn(CFG)(
            jax.device_get(trainer.state["params"]), b, None)
        losses.append(float(l))
    # bf16 + sharded-reduction ordering differ slightly from the unjitted
    # host recompute; the regression target is the 2x double-count
    np.testing.assert_allclose(e1["eval_loss"], np.mean(losses), rtol=0.05)
