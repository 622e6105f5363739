"""Pretrained-weight converter parity for the audio/video towers
(VERDICT r2 missing #3): the faithful wav2vec2/data2vec-audio encoder
(nn/wav2vec2.py) and r3d_18 video encoder (nn/video.py arch="r3d18") must
reproduce the torch modules' outputs after conversion, so real checkpoints
(the reference wires Data2VecForCTC / torchvision r3d_18 pretrained,
/root/reference/experimental/model/video/kosmos_video.py:126-134) load 1:1.

HF transformers is installed (random-init modules are the oracle, like the
CLIP parity tests); torchvision is NOT, so the r3d_18 oracle is a minimal
torch module reproducing torchvision.models.video.resnet's exact layout and
state_dict keys.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from kosmosx_tpu.core.config import AudioConfig, VideoConfig, Wav2Vec2Config
from kosmosx_tpu.nn.audio import audio_encoder, init_audio_encoder
from kosmosx_tpu.nn.video import video_encoder
from kosmosx_tpu.nn.wav2vec2 import init_wav2vec2, wav2vec2_encode
from kosmosx_tpu.utils.hf_convert import (data2vec_audio_params_from_hf,
                                          r3d18_params_from_state_dict,
                                          wav2vec2_params_from_hf)

# small shapes shared by the HF config and ours
_W2V = dict(hidden_dim=32, layers=2, heads=4, mlp_dim=64,
            conv_dim=(16, 16), conv_kernel=(10, 3), conv_stride=(5, 2),
            pos_conv_kernel=16, pos_conv_groups=4)


def _hf_wav2vec2(stable: bool):
    from transformers import Wav2Vec2Config as HFCfg
    from transformers import Wav2Vec2Model
    hf = HFCfg(hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
               intermediate_size=64, conv_dim=(16, 16), conv_kernel=(10, 3),
               conv_stride=(5, 2), num_feat_extract_layers=2,
               num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
               feat_extract_norm="layer" if stable else "group",
               do_stable_layer_norm=stable,
               hidden_dropout=0.0, attention_dropout=0.0,
               feat_proj_dropout=0.0, layerdrop=0.0)
    torch.manual_seed(0)
    return Wav2Vec2Model(hf).eval()


@pytest.mark.parametrize("stable", [False, True])
def test_wav2vec2_parity(stable):
    model = _hf_wav2vec2(stable)
    cfg = Wav2Vec2Config(**_W2V,
                         feat_norm="layer" if stable else "group",
                         stable_layer_norm=stable)
    params = wav2vec2_params_from_hf(model,
                                     feat_norm=cfg.feat_norm)
    wav = np.random.RandomState(1).randn(2, 400).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(wav)).last_hidden_state.numpy()
    with jax.default_matmul_precision("highest"):
        ours = np.asarray(wav2vec2_encode(params, jnp.asarray(wav), cfg))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=2e-4)


def test_data2vec_audio_parity():
    from transformers import Data2VecAudioConfig as HFCfg
    from transformers import Data2VecAudioModel
    hf = HFCfg(hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
               intermediate_size=64, conv_dim=(16, 16), conv_kernel=(10, 3),
               conv_stride=(5, 2), num_feat_extract_layers=2,
               conv_pos_kernel_size=9, num_conv_pos_embeddings=2,
               num_conv_pos_embedding_groups=4,
               hidden_dropout=0.0, attention_dropout=0.0,
               feat_proj_dropout=0.0, layerdrop=0.0)
    torch.manual_seed(1)
    model = Data2VecAudioModel(hf).eval()
    cfg = Wav2Vec2Config(**{**_W2V, "pos_conv_kernel": 9},
                         feat_norm="layer", pos_conv_mode="data2vec",
                         pos_convs=2)
    params = data2vec_audio_params_from_hf(model)
    assert len(params["pos_conv"]) == 2
    wav = np.random.RandomState(2).randn(2, 400).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(wav)).last_hidden_state.numpy()
    with jax.default_matmul_precision("highest"):
        ours = np.asarray(wav2vec2_encode(params, jnp.asarray(wav), cfg))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=2e-4)


def test_audio_config_dispatch():
    """AudioConfig(arch='wav2vec2') routes init/encode through the faithful
    module so KosmosConditional's audio tower is checkpoint-loadable."""
    w2v = Wav2Vec2Config(**_W2V)
    cfg = AudioConfig(arch="wav2vec2", hidden_dim=32, w2v=w2v)
    p = init_audio_encoder(jax.random.PRNGKey(0), cfg)
    out = audio_encoder(p, jnp.ones((1, 400)), cfg)
    assert out.shape[0] == 1 and out.shape[-1] == 32
    with pytest.raises(ValueError, match="hidden_dim"):
        init_audio_encoder(jax.random.PRNGKey(0),
                           AudioConfig(arch="wav2vec2", hidden_dim=64,
                                       w2v=w2v))


# ---------------------------------------------------------------------------
# r3d_18: minimal torch oracle with torchvision's exact module layout
# (torchvision.models.video.resnet: BasicBlock + Conv3DSimple + BasicStem)
# ---------------------------------------------------------------------------


class _Conv3DSimple(torch.nn.Conv3d):
    def __init__(self, cin, cout, stride=1):
        super().__init__(cin, cout, kernel_size=(3, 3, 3),
                         stride=(stride, stride, stride),
                         padding=(1, 1, 1), bias=False)


class _BasicBlock(torch.nn.Module):
    def __init__(self, cin, planes, stride=1):
        super().__init__()
        self.conv1 = torch.nn.Sequential(
            _Conv3DSimple(cin, planes, stride),
            torch.nn.BatchNorm3d(planes), torch.nn.ReLU(inplace=True))
        self.conv2 = torch.nn.Sequential(
            _Conv3DSimple(planes, planes),
            torch.nn.BatchNorm3d(planes))
        self.relu = torch.nn.ReLU(inplace=True)
        self.downsample = None
        if stride != 1 or cin != planes:
            self.downsample = torch.nn.Sequential(
                torch.nn.Conv3d(cin, planes, kernel_size=1,
                                stride=(stride, stride, stride), bias=False),
                torch.nn.BatchNorm3d(planes))

    def forward(self, x):
        res = x if self.downsample is None else self.downsample(x)
        out = self.conv2(self.conv1(x))
        return self.relu(out + res)


class _R3D18(torch.nn.Module):
    """torchvision r3d_18 minus avgpool/fc (state_dict-key compatible)."""

    def __init__(self, widths=(8, 16, 32, 64)):
        super().__init__()
        self.stem = torch.nn.Sequential(
            torch.nn.Conv3d(3, widths[0], kernel_size=(3, 7, 7),
                            stride=(1, 2, 2), padding=(1, 3, 3), bias=False),
            torch.nn.BatchNorm3d(widths[0]), torch.nn.ReLU(inplace=True))
        cin = widths[0]
        for i, w in enumerate(widths):
            stride = 1 if i == 0 else 2
            setattr(self, f"layer{i+1}", torch.nn.Sequential(
                _BasicBlock(cin, w, stride), _BasicBlock(w, w)))
            cin = w

    def forward(self, x):
        x = self.stem(x)
        for i in range(4):
            x = getattr(self, f"layer{i+1}")(x)
        return x.mean(dim=(2, 3, 4))


def _randomize_bn_stats(model, seed=3):
    """Random (non-identity) BN running stats so the fold is actually
    exercised — fresh BNs have mean 0 / var 1 which would hide bugs."""
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm3d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape,
                                             generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.running_var.shape,
                                           generator=g) + 0.5)
            with torch.no_grad():
                m.weight.copy_(torch.rand(m.weight.shape, generator=g) + 0.5)
                m.bias.copy_(torch.randn(m.bias.shape, generator=g) * 0.1)


@pytest.mark.slow
def test_r3d18_parity():
    torch.manual_seed(4)
    oracle = _R3D18(widths=(8, 16, 32, 64)).eval()
    _randomize_bn_stats(oracle)
    params = r3d18_params_from_state_dict(oracle.state_dict())
    # tiny width variant: relax the 512 check by building params directly
    cfg = dataclasses.replace(VideoConfig(arch="r3d18", hidden_dim=512),
                              hidden_dim=64)
    clips = np.random.RandomState(5).randn(2, 3, 4, 32, 32).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(clips)).numpy()
    with jax.default_matmul_precision("highest"):
        ours = np.asarray(video_encoder(params, jnp.asarray(clips), cfg))
    assert ours.shape == ref.shape == (2, 64)
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=2e-4)


def test_r3d18_hidden_dim_guard():
    from kosmosx_tpu.nn.video import init_video_encoder
    with pytest.raises(ValueError, match="512"):
        init_video_encoder(jax.random.PRNGKey(0),
                           VideoConfig(arch="r3d18", hidden_dim=64))
