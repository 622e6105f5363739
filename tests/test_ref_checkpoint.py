"""Reference-checkpoint import/export round trip (VERDICT round-1 missing #2).

The reference's end state is a consolidated torch state_dict
(/root/reference/train.py:688-695) over torchscale + flamingo + HF-CLIP
module naming. Neither library is installed here, so the contract is tested
as a round trip: our pytree -> reference-layout state_dict -> pytree must be
the identity, and a .pt file written by the exporter must load through
``load_reference_checkpoint`` and produce identical forwards.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kosmosx_tpu.core.config import (KosmosConfig, MagnetoConfig,
                                     ResamplerConfig, VisionConfig)
from kosmosx_tpu.models.kosmos import Kosmos
from kosmosx_tpu.nn import decoder as dec
from kosmosx_tpu.utils.ref_checkpoint import (
    decoder_params_from_state_dict, kosmos_params_from_state_dict,
    load_reference_checkpoint, save_reference_checkpoint, stack_layers,
    state_dict_from_decoder_params, state_dict_from_kosmos_params,
    unstack_layers)

DEC = MagnetoConfig(vocab_size=64, embed_dim=32, ffn_dim=64, layers=2,
                    heads=4, max_positions=64, use_flash_attention=False,
                    multiway=True, dropout=0.0, attention_dropout=0.0)
KCFG = KosmosConfig(
    decoder=DEC,
    vision=VisionConfig(image_size=28, patch_size=14, hidden_dim=32,
                        layers=2, heads=2, mlp_dim=64,
                        use_flash_attention=False),
    resampler=ResamplerConfig(dim=32, depth=2, dim_head=8, heads=2,
                              num_latents=4, num_media_embeds=5),
    image_embed_len=4)


def _trees_close(a, b, rtol=1e-6):
    la, ta = jax.tree_util.tree_flatten(a)
    lb, tb = jax.tree_util.tree_flatten(b)
    assert ta == tb, f"tree structure mismatch:\n{ta}\nvs\n{tb}"
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x, np.float32),
                                   np.asarray(y, np.float32), rtol=rtol)


@pytest.mark.parametrize("multiway", [True, False])
def test_decoder_roundtrip(multiway):
    cfg = MagnetoConfig(vocab_size=64, embed_dim=32, ffn_dim=64, layers=2,
                        heads=4, max_positions=64,
                        use_flash_attention=False, multiway=multiway,
                        dropout=0.0, attention_dropout=0.0)
    params = dec.init_decoder(jax.random.PRNGKey(0), cfg)
    sd = state_dict_from_decoder_params(params)
    # multiway A/B naming present exactly when configured
    has_ab = any(".A." in k for k in sd)
    assert has_ab == multiway
    assert "decoder.layers.0.self_attn.inner_attn_ln.A.weight" in sd or not multiway
    back = decoder_params_from_state_dict(sd, cfg)
    _trees_close(params, back)


def test_decoder_roundtrip_forward_parity():
    params = dec.init_decoder(jax.random.PRNGKey(1), DEC)
    back = decoder_params_from_state_dict(
        state_dict_from_decoder_params(params), DEC)
    toks = jax.random.randint(jax.random.PRNGKey(2), (2, 10), 0, 64)
    ref = dec.decoder_forward(params, toks, DEC)
    got = dec.decoder_forward(back, toks, DEC)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_decoder_layer_count_mismatch_raises():
    params = dec.init_decoder(jax.random.PRNGKey(0), DEC)
    sd = state_dict_from_decoder_params(params)
    wrong = MagnetoConfig(vocab_size=64, embed_dim=32, ffn_dim=64, layers=3,
                          heads=4, max_positions=64,
                          use_flash_attention=False, multiway=True)
    with pytest.raises(ValueError, match="2 decoder layers"):
        decoder_params_from_state_dict(sd, wrong)


def test_kosmos_full_roundtrip():
    params = Kosmos.init(jax.random.PRNGKey(0), KCFG)
    sd = state_dict_from_kosmos_params(params)
    # spot-check reference naming (SURVEY.md §2.1 module tree)
    assert "clip_model.embeddings.patch_embedding.weight" in sd
    assert sd["clip_model.embeddings.patch_embedding.weight"].shape == (32, 3, 14, 14)
    assert "perceive.media_pos_emb" in sd
    assert sd["perceive.media_pos_emb"].shape == (5, 1, 32)
    assert "perceive.layers.0.1.1.weight" in sd  # Sequential FF fc1
    assert "embed.weight" in sd and "image_proj.weight" in sd
    assert sd["image_proj.weight"].shape == (32, 32)
    back = kosmos_params_from_state_dict(sd, KCFG)
    _trees_close(params, back)


@pytest.mark.slow
def test_kosmos_roundtrip_forward_parity():
    params = Kosmos.init(jax.random.PRNGKey(3), KCFG)
    back = kosmos_params_from_state_dict(
        state_dict_from_kosmos_params(params), KCFG)
    toks = np.array([[0, 4, 10, 11, 12, 13]], np.int32)
    imgs = jax.random.uniform(jax.random.PRNGKey(4), (1, 3, 28, 28))
    ref = Kosmos.apply(params, toks, imgs, KCFG)
    got = Kosmos.apply(back, toks, imgs, KCFG)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_torch_pt_file_roundtrip(tmp_path):
    """save_reference_checkpoint writes a .pt that load_reference_checkpoint
    reads back (the final_model.pt flow, ref train.py:688-695)."""
    torch = pytest.importorskip("torch")
    params = Kosmos.init(jax.random.PRNGKey(5), KCFG)
    path = str(tmp_path / "final_model.pt")
    save_reference_checkpoint(params, path)
    sd = torch.load(path, map_location="cpu", weights_only=True)
    assert all(isinstance(v, torch.Tensor) for v in sd.values())
    back = load_reference_checkpoint(path, KCFG)
    _trees_close(params, back)


def test_load_handles_wrapper_prefixes(tmp_path):
    """FSDP/compile-style key prefixes are stripped on import."""
    torch = pytest.importorskip("torch")
    params = Kosmos.init(jax.random.PRNGKey(6), KCFG)
    sd = {f"_orig_mod.{k}": torch.from_numpy(np.array(v, np.float32))
          for k, v in state_dict_from_kosmos_params(params).items()}
    path = str(tmp_path / "wrapped.pt")
    torch.save(sd, path)
    back = load_reference_checkpoint(path, KCFG)
    _trees_close(params, back)


def test_scan_layers_stack_unstack():
    params = dec.init_decoder(jax.random.PRNGKey(7), DEC)
    stacked = stack_layers(params["layers"])
    assert stacked["attn"]["q"]["A"]["w"].shape == (2, 32, 32)
    back = unstack_layers(stacked)
    _trees_close(params["layers"], back)


@pytest.mark.slow
def test_import_to_scan_layout():
    """A checkpoint imports directly into a scan_layers config."""
    scan_cfg = KosmosConfig(
        decoder=MagnetoConfig(vocab_size=64, embed_dim=32, ffn_dim=64,
                              layers=2, heads=4, max_positions=64,
                              use_flash_attention=False, multiway=True,
                              dropout=0.0, attention_dropout=0.0,
                              scan_layers=True),
        vision=KCFG.vision, resampler=KCFG.resampler, image_embed_len=4)
    params = Kosmos.init(jax.random.PRNGKey(8), KCFG)
    back = kosmos_params_from_state_dict(
        state_dict_from_kosmos_params(params), scan_cfg)
    assert back["decoder"]["layers"]["attn"]["q"]["A"]["w"].shape == (2, 32, 32)
    toks = np.array([[0, 4, 10, 11, 12, 13]], np.int32)
    imgs = jax.random.uniform(jax.random.PRNGKey(9), (1, 3, 28, 28))
    ref = Kosmos.apply(params, toks, imgs, KCFG)
    got = Kosmos.apply(back, toks, imgs, scan_cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_import_reference_script_end_to_end(tmp_path):
    """Drive scripts/import_reference.py one-command path on a synthetic
    reference checkpoint (VERDICT r2 missing #1: the onboarding path must be
    provably ready before real weights exist): export a tiny Kosmos as
    final_model.pt, run the script, restore the orbax dir, forward parity."""
    import subprocess
    import sys

    torch = pytest.importorskip("torch")
    pytest.importorskip("orbax.checkpoint")
    params = Kosmos.init(jax.random.PRNGKey(11), KCFG)
    pt = str(tmp_path / "final_model.pt")
    save_reference_checkpoint(params, pt)

    out = str(tmp_path / "imported")
    r = subprocess.run(
        [sys.executable, "scripts/import_reference.py", "--final-model", pt,
         "--out", out, "--config", "tiny-test"],
        capture_output=True, text=True, cwd=".",
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stderr
    assert "wrote" in r.stdout

    from kosmosx_tpu.train import checkpoint as ckpt
    restored = ckpt.restore_params(out)
    toks = np.array([[0, 4, 10, 11, 12, 13]], np.int32)
    imgs = jax.random.uniform(jax.random.PRNGKey(9), (1, 3, 28, 28))
    ref = Kosmos.apply(params, toks, imgs, KCFG)
    got = Kosmos.apply(jax.tree_util.tree_map(jnp.asarray, restored),
                       toks, imgs, KCFG)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_export_emits_decoder_registered_aliases():
    """The reference's consolidated save holds the shared embed/pos/out_proj
    modules under BOTH their top-level and decoder-registered names
    (/root/reference/kosmosx/model.py:161-167,186-191); our export must too
    so a strict torchscale load_state_dict finds every key."""
    params = dec.init_decoder(jax.random.PRNGKey(1), DEC)
    sd = state_dict_from_decoder_params(params)
    for a, b in [("embed.weight", "decoder.embed_tokens.weight"),
                 ("embed_positions.weight",
                  "decoder.embed_positions.weight"),
                 ("output_projection.weight",
                  "decoder.output_projection.weight")]:
        assert b in sd
        np.testing.assert_array_equal(sd[a], sd[b])
    # and the importer accepts EITHER name (alias-only dict)
    only_alias = {k: v for k, v in sd.items()
                  if k not in ("embed.weight", "embed_positions.weight",
                               "output_projection.weight")}
    back = decoder_params_from_state_dict(only_alias, DEC)
    _trees_close(params, back)


# -- gated end-to-end tests: activate when real artifacts are present -------

_REF_PT = __import__("os").environ.get("KOSMOSX_REF_WEIGHTS")
_CLIP = __import__("os").environ.get("KOSMOSX_CLIP_WEIGHTS")


@pytest.mark.skipif(not _REF_PT, reason="KOSMOSX_REF_WEIGHTS not set")
def test_real_reference_checkpoint_imports():
    """Real final_model.pt -> flagship pytree -> finite forward."""
    cfg = KosmosConfig()
    params = load_reference_checkpoint(_REF_PT, cfg)
    toks = np.array([[0, 4, 10, 11, 12, 13]], np.int32)
    imgs = np.zeros((1, 3, 224, 224), np.float32)
    logits = Kosmos.apply(jax.tree_util.tree_map(jnp.asarray, params),
                          toks, imgs, cfg)
    assert bool(jnp.all(jnp.isfinite(logits.astype(jnp.float32))))


@pytest.mark.skipif(not _CLIP, reason="KOSMOSX_CLIP_WEIGHTS not set")
def test_real_clip_checkpoint_imports():
    """Real laion CLIP file -> vision pytree -> finite features of the right
    shape (B, 257, 1024)."""
    from kosmosx_tpu.core.config import VisionConfig
    from kosmosx_tpu.nn.vision import clip_vit
    from kosmosx_tpu.utils.hf_convert import load_clip_checkpoint

    p = load_clip_checkpoint(_CLIP)
    feats = clip_vit(p, jnp.zeros((1, 3, 224, 224)), VisionConfig())
    assert feats.shape == (1, 257, 1024)
    assert bool(jnp.all(jnp.isfinite(feats.astype(jnp.float32))))
