"""LoRA fine-tuning (train/lora.py): factor insertion, apply-path algebra,
merge/strip round-trips, QLoRA over W8 bases, and the sharded LoraTrainer.

Capability beyond the reference — kyegomez/Kosmos-X fine-tunes only by
resuming full training (/root/reference/train.py:618-639)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from kosmosx_tpu.core.config import MagnetoConfig
from kosmosx_tpu.nn import decoder as dec
from kosmosx_tpu.nn import layers
from kosmosx_tpu.train.lora import (DEFAULT_TARGETS, LoraTrainer, add_lora,
                                    attach_lora, lora_state,
                                    make_lora_train_step, merge_lora,
                                    num_lora_params, strip_lora)
from kosmosx_tpu.train.trainer import TrainConfig, lm_loss_fn

CFG = MagnetoConfig(vocab_size=64, embed_dim=32, ffn_dim=64, layers=2,
                    heads=4, max_positions=64, use_flash_attention=False,
                    multiway=False, dropout=0.0, attention_dropout=0.0)
CFG_MW_SCAN = MagnetoConfig(vocab_size=64, embed_dim=32, ffn_dim=64, layers=2,
                            heads=4, max_positions=64,
                            use_flash_attention=False, multiway=True,
                            dropout=0.0, attention_dropout=0.0,
                            scan_layers=True)
RANK = 4


def _tokens(key, batch=2, seq=16, vocab=64):
    return jax.random.randint(key, (batch, seq), 2, vocab)


def test_add_lora_targets_and_identity_at_init():
    key = jax.random.PRNGKey(0)
    params = dec.init_decoder(key, CFG)
    adapted = add_lora(jax.random.fold_in(key, 1), params, RANK)
    l0 = adapted["layers"][0]
    for name in ("q", "k", "v", "out"):
        assert "lora" in l0["attn"][name]
        a = l0["attn"][name]["lora"]["a"]
        assert a.shape == (CFG.embed_dim, RANK)
    assert "lora" in l0["ffn"]["fc1"] and "lora" in l0["ffn"]["fc2"]
    # untargeted: embeddings, LNs, out_proj (not in DEFAULT_TARGETS)
    assert "lora" not in adapted["out_proj"]
    assert "lora" not in adapted["embed"]

    toks = _tokens(jax.random.fold_in(key, 2))
    base_logits = dec.decoder_forward(params, toks, CFG)
    lora_logits = dec.decoder_forward(adapted, toks, CFG)
    # b is zero-init: the adapted model IS the base model
    np.testing.assert_allclose(np.asarray(base_logits),
                               np.asarray(lora_logits), atol=1e-6)


def test_linear_lora_algebra():
    key = jax.random.PRNGKey(1)
    p = {"w": jax.random.normal(key, (8, 12)),
         "b": jax.random.normal(jax.random.fold_in(key, 1), (12,))}
    lora = {"a": jax.random.normal(jax.random.fold_in(key, 2), (8, 3)),
            "b": jax.random.normal(jax.random.fold_in(key, 3), (3, 12)),
            "scale": jnp.asarray(0.5, jnp.float32)}
    x = jax.random.normal(jax.random.fold_in(key, 4), (5, 8))
    got = layers.linear({**p, "lora": lora}, x)
    want = x @ p["w"] + 0.5 * ((x @ lora["a"]) @ lora["b"]) + p["b"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


@pytest.mark.parametrize("cfg", [
    CFG, pytest.param(CFG_MW_SCAN, marks=pytest.mark.slow)],
    ids=["plain", "mw_scan"])
def test_merge_matches_unmerged(cfg):
    key = jax.random.PRNGKey(2)
    params = dec.init_decoder(key, cfg)
    adapted = add_lora(jax.random.fold_in(key, 1), params, RANK, alpha=8.0)
    # give the factors real values (b starts zero)
    adapted = jax.tree_util.tree_map_with_path(
        lambda path, x: (jax.random.normal(
            jax.random.fold_in(key, len(jax.tree_util.keystr(path))), x.shape,
            x.dtype) * 0.05
            if any(getattr(p, "key", None) == "lora" for p in path)
            and path[-1].key in ("a", "b") else x),
        adapted)
    toks = _tokens(jax.random.fold_in(key, 3))
    unmerged = dec.decoder_forward(adapted, toks, cfg)
    merged = merge_lora(adapted)
    assert not jax.tree_util.tree_reduce(
        lambda acc, _: acc + 1,
        jax.tree_util.tree_map(lambda x: 1,
                               strip_lora(merged)[1]), 0)
    merged_logits = dec.decoder_forward(merged, toks, cfg)
    np.testing.assert_allclose(np.asarray(unmerged),
                               np.asarray(merged_logits),
                               atol=2e-2 if cfg.dtype == jnp.bfloat16
                               else 1e-4)


def test_strip_attach_round_trip():
    key = jax.random.PRNGKey(3)
    params = dec.init_decoder(key, CFG)
    adapted = add_lora(jax.random.fold_in(key, 1), params, RANK)
    base, lora_tree = strip_lora(adapted)
    assert num_lora_params(lora_tree) > 0
    # base contains no lora nodes
    assert num_lora_params(strip_lora(base)[1]) == 0
    rebuilt = attach_lora(base, lora_tree)
    ja, jb = jax.tree_util.tree_structure(adapted), \
        jax.tree_util.tree_structure(rebuilt)
    assert ja == jb
    for x, y in zip(jax.tree_util.tree_leaves(adapted),
                    jax.tree_util.tree_leaves(rebuilt)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_lora_train_step_trains_only_adapters():
    key = jax.random.PRNGKey(4)
    params = dec.init_decoder(key, CFG)
    base, lora_tree = strip_lora(
        add_lora(jax.random.fold_in(key, 1), params, RANK))
    opt = optax.adam(1e-2)
    state = lora_state(lora_tree, opt, jax.random.fold_in(key, 2))
    step = jax.jit(make_lora_train_step(lm_loss_fn(CFG), opt))

    toks = _tokens(jax.random.fold_in(key, 3))
    batch = {"input_ids": toks}
    losses = []
    for _ in range(8):
        state, metrics = step(state, base, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    # optimizer state is rank-sized: smaller than even one base copy (full
    # Adam would need 2x the base; at flagship dims the ratio is ~1000x)
    n_opt = sum(x.size for x in jax.tree_util.tree_leaves(state["opt_state"])
                if hasattr(x, "size"))
    n_base = sum(x.size for x in jax.tree_util.tree_leaves(base))
    assert n_opt < n_base


def test_qlora_over_w8_base():
    from kosmosx_tpu.utils.quantize import quantize_params_w8

    key = jax.random.PRNGKey(5)
    params = dec.init_decoder(key, CFG)
    q = quantize_params_w8(params, min_size=64)
    adapted = add_lora(jax.random.fold_in(key, 1), q, RANK)
    # factors attach to quantized linears too
    assert "lora" in adapted["layers"][0]["attn"]["q"]
    toks = _tokens(jax.random.fold_in(key, 2))
    logits = dec.decoder_forward(adapted, toks, CFG)
    assert np.isfinite(np.asarray(logits, np.float32)).all()
    with pytest.raises(ValueError, match="int8"):
        merge_lora(adapted)


def test_lora_trainer_sharded_and_merge():
    cfg = TrainConfig(batch_size=4, seq_len=16, total_steps=6,
                      learning_rate=1e-2, optimizer="adamw",
                      schedule="constant", checkpoint_every=0, log_every=1,
                      data=2, fsdp=2, tensor=2)
    init_fn = lambda k: dec.init_decoder(k, CFG)
    trainer = LoraTrainer(init_fn=init_fn, loss_fn=lm_loss_fn(CFG), cfg=cfg,
                          rank=RANK)
    key = jax.random.PRNGKey(6)
    batches = ({"input_ids": np.asarray(_tokens(jax.random.fold_in(key, i),
                                                batch=4))}
               for i in range(6))
    state, metrics = trainer.run(batches, steps=6)
    assert np.isfinite(float(metrics["loss"]))

    toks = _tokens(jax.random.fold_in(key, 99), batch=1)
    adapted = dec.decoder_forward(trainer.adapted_params(), toks, CFG)
    merged = dec.decoder_forward(trainer.merged_params(), toks, CFG)
    np.testing.assert_allclose(np.asarray(adapted), np.asarray(merged),
                               atol=1e-4)
    # LoRA-aware validation runs over the adapted model
    ev = trainer.evaluate([{"input_ids": np.asarray(
        _tokens(jax.random.fold_in(key, 123), batch=4))}])
    assert np.isfinite(ev["eval_loss"])


@pytest.mark.slow
def test_lora_cli_from_checkpoint(tmp_path):
    """Two-stage CLI flow: full training writes {output-dir}/final (the
    reference's final_model.pt, train.py:688-695); a LoRA run resumes from it
    via --init-checkpoint and writes a merged final save of its own."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {**os.environ, "JAX_PLATFORMS": "cpu", "HF_HUB_OFFLINE": "1",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=2"}
    common = [sys.executable, os.path.join(repo, "scripts", "train.py"),
              "--model", "language", "--synthetic", "--layers", "1",
              "--dim", "32", "--ffn-dim", "64", "--heads", "2",
              "--vocab-size", "97", "--max-positions", "64",
              "--dtype", "float32", "--no-flash", "--batch-size", "2",
              "--seq-len", "16", "--steps", "4", "--log-every", "2",
              "--checkpoint-every", "0", "--optimizer", "adamw",
              "--data", "2", "--scan-layers"]
    base_dir = tmp_path / "base"
    out = subprocess.run(common + ["--output-dir", str(base_dir)],
                         capture_output=True, text=True, timeout=600, env=env)
    assert out.returncode == 0, (out.stderr[-2000:], out.stdout[-500:])
    assert (base_dir / "final").exists()

    lora_dir = tmp_path / "lora"
    out = subprocess.run(
        common + ["--output-dir", str(lora_dir), "--lora-rank", "2",
                  "--init-checkpoint", str(base_dir / "final")],
        capture_output=True, text=True, timeout=600, env=env)
    assert out.returncode == 0, (out.stderr[-2000:], out.stdout[-500:])
    assert (lora_dir / "final").exists()    # merged params
    assert (lora_dir / "adapter").exists()  # raw factors (multi-LoRA serving)

    # stage 3: multi-LoRA serving smoke — serve a prompt through the saved
    # adapter over a matching base config
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "serve.py"),
         "--layers", "1", "--dim", "32", "--ffn-dim", "64", "--heads", "2",
         "--vocab-size", "97", "--max-positions", "64",
         "--dtype", "float32", "--no-flash", "--slots", "2",
         "--max-prompt-len", "16", "--max-new-tokens", "4", "--sync-lag",
         "0", "--adapter", f"tuned={lora_dir / 'adapter'}",
         "--use-adapter", "tuned", "--prompt", "hello"],
        capture_output=True, text=True, timeout=600, env=env)
    assert out.returncode == 0, (out.stderr[-2000:], out.stdout[-500:])
    assert "[req 0]" in out.stdout


def test_save_restore_params_round_trip(tmp_path):
    from kosmosx_tpu.train import checkpoint as ckpt

    key = jax.random.PRNGKey(7)
    params = dec.init_decoder(key, CFG)
    path = ckpt.save_params(params, str(tmp_path / "final"))
    abstract = jax.eval_shape(lambda: params)
    restored = ckpt.restore_params(path, abstract)
    for x, y in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.slow
def test_lora_on_kosmos_multimodal():
    """Adapters attach across the full Kosmos tree (decoder q/k/v/out/fc1/
    fc2 AND, with ALL_TARGETS, the resampler/projection linears); zero-init
    keeps the multimodal forward bit-identical."""
    from kosmosx_tpu.core.config import (KosmosConfig, ResamplerConfig,
                                         VisionConfig)
    from kosmosx_tpu.models.kosmos import Kosmos
    from kosmosx_tpu.train.lora import ALL_TARGETS

    kcfg = KosmosConfig(
        decoder=CFG,
        vision=VisionConfig(image_size=28, patch_size=14, hidden_dim=32,
                            layers=1, heads=2, mlp_dim=64,
                            use_flash_attention=False),
        resampler=ResamplerConfig(dim=32, depth=1, dim_head=8, heads=4,
                                  num_latents=8, num_media_embeds=5),
        image_embed_len=8)
    params = Kosmos.init(jax.random.PRNGKey(0), kcfg)
    adapted = add_lora(jax.random.PRNGKey(1), params, RANK,
                       targets=ALL_TARGETS)
    assert "lora" in adapted["decoder"]["layers"][0]["attn"]["q"]
    assert "lora" in adapted["image_proj"]
    toks = jax.random.randint(jax.random.PRNGKey(5), (2, 6), 4,
                              CFG.vocab_size)
    imgs = jnp.zeros((2, 3, 28, 28), jnp.float32)
    base_logits = Kosmos.apply(params, toks, imgs, kcfg)
    lora_logits = Kosmos.apply(adapted, toks, imgs, kcfg)
    np.testing.assert_allclose(np.asarray(base_logits),
                               np.asarray(lora_logits), atol=1e-6)


def test_w8_params_checkpoint_round_trip(tmp_path):
    """W8-quantized param trees ({'q','scale'} dicts) survive the orbax
    params checkpoint unchanged."""
    from kosmosx_tpu.train import checkpoint as ckpt
    from kosmosx_tpu.utils.quantize import quantize_params_w8

    params = dec.init_decoder(jax.random.PRNGKey(0), CFG)
    q = quantize_params_w8(params, min_size=64)
    path = ckpt.save_params(q, str(tmp_path / "w8"))
    restored = ckpt.restore_params(path)
    for a, b in zip(jax.tree_util.tree_leaves(q),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
