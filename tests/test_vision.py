"""CLIP ViT parity vs HF transformers (torch CPU, random weights).

The reference consumes HF CLIP's last_hidden_state
(/root/reference/kosmosx/model.py:154-156,230). We build a randomly
initialized HF ``CLIPVisionModel`` (no download — zero egress), convert its
weights with utils/hf_convert.py, and require our JAX tower to reproduce
last_hidden_state. This is the BASELINE.json config-3 parity check.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kosmosx_tpu.core.config import VisionConfig
from kosmosx_tpu.nn.vision import clip_vit, init_clip_vit, patchify
from kosmosx_tpu.utils.hf_convert import clip_vision_params_from_hf

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def hf_pair():
    from transformers import CLIPVisionConfig, CLIPVisionModel
    hf_cfg = CLIPVisionConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, image_size=56, patch_size=14,
        hidden_act="gelu", layer_norm_eps=1e-5)
    torch.manual_seed(0)
    model = CLIPVisionModel(hf_cfg).eval()
    cfg = VisionConfig(image_size=56, patch_size=14, hidden_dim=64, layers=2,
                       heads=4, mlp_dim=128, activation="gelu",
                       use_flash_attention=False)
    params = clip_vision_params_from_hf(model)
    return model, cfg, params


def test_last_hidden_state_parity(hf_pair):
    model, cfg, params = hf_pair
    rng = np.random.RandomState(0)
    pix = rng.randn(2, 3, 56, 56).astype(np.float32)
    with torch.no_grad():
        ref = model(pixel_values=torch.from_numpy(pix)).last_hidden_state.numpy()
    ours = clip_vit(params, jnp.asarray(pix), cfg)
    assert ours.shape == ref.shape == (2, 17, 64)  # 16 patches + CLS
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4, rtol=2e-4)


def test_pooled_output_parity(hf_pair):
    model, cfg, params = hf_pair
    rng = np.random.RandomState(1)
    pix = rng.randn(1, 3, 56, 56).astype(np.float32)
    with torch.no_grad():
        ref = model(pixel_values=torch.from_numpy(pix)).pooler_output.numpy()
    _, pooled = clip_vit(params, jnp.asarray(pix), cfg, return_pooled=True)
    np.testing.assert_allclose(np.asarray(pooled), ref, atol=2e-4, rtol=2e-4)


def test_patchify_matches_conv():
    """Our reshape-matmul patch embed == torch stride-p conv."""
    rng = np.random.RandomState(2)
    pix = rng.randn(1, 3, 28, 28).astype(np.float32)
    w = rng.randn(8, 3, 14, 14).astype(np.float32)
    conv = torch.nn.functional.conv2d(
        torch.from_numpy(pix), torch.from_numpy(w), stride=14)
    ref = conv.flatten(2).transpose(1, 2).numpy()  # (1, 4, 8)
    patches = patchify(jnp.asarray(pix), 14)
    ours = patches @ jnp.asarray(w.reshape(8, -1).T)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4, rtol=1e-4)


def test_random_init_runs():
    cfg = VisionConfig(image_size=28, patch_size=14, hidden_dim=32, layers=1,
                       heads=2, mlp_dim=64, use_flash_attention=False)
    params = init_clip_vit(jax.random.PRNGKey(0), cfg)
    out = clip_vit(params, jnp.zeros((1, 3, 28, 28)), cfg)
    assert out.shape == (1, 5, 32)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_file_based_clip_import(hf_pair, tmp_path):
    """load_clip_checkpoint reads a saved HF checkpoint file (safetensors
    and torch .bin) and the imported params reproduce the HF forward."""
    import torch

    from kosmosx_tpu.nn.vision import clip_vit
    from kosmosx_tpu.utils.hf_convert import load_clip_checkpoint

    model, cfg, params_ref = hf_pair
    # safetensors directory layout
    d = tmp_path / "ckpt"
    d.mkdir()
    from safetensors.torch import save_file
    save_file({k: v.contiguous() for k, v in model.state_dict().items()},
              str(d / "model.safetensors"))
    params = load_clip_checkpoint(str(d))
    x = np.asarray(jax.random.uniform(jax.random.PRNGKey(3),
                                      (1, 3, cfg.image_size, cfg.image_size)))
    ours = clip_vit(params, jnp.asarray(x), cfg)
    with torch.no_grad():
        ref = model(pixel_values=torch.from_numpy(x)).last_hidden_state
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(),
                               atol=2e-4, rtol=2e-4)

    # torch .bin layout
    torch.save(model.state_dict(), str(tmp_path / "pytorch_model.bin"))
    params2 = load_clip_checkpoint(str(tmp_path / "pytorch_model.bin"))
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(params2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
