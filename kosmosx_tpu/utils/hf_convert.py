"""Weight converters: HF/torch checkpoints -> kosmosx_tpu param pytrees.

The reference downloads ``laion/CLIP-ViT-L-14-laion2B-s32B-b82K`` at model
construction (/root/reference/kosmosx/model.py:154-156). We instead accept an
HF ``CLIPVisionModel`` (or its state_dict) and convert once to a JAX pytree —
no torch in the compute path afterwards. This is also the parity oracle hook:
tests drive a randomly-initialized HF CLIP through both stacks and compare
last_hidden_state (SURVEY.md §7 step 2).

Conventions converted:
- torch ``nn.Linear.weight`` is (out, in) -> ours is (in, out): transpose;
- patch conv weight (d, 3, p, p) -> flat (3*p*p, d) matching
  ``nn.vision.patchify``'s (c, ph, pw) per-patch ordering.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _t(x) -> np.ndarray:
    """torch tensor / array-like -> numpy (float32)."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def _linear(sd: Dict[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    out = {"w": _t(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["b"] = _t(sd[f"{prefix}.bias"])
    return out


def _ln(sd: Dict[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": _t(sd[f"{prefix}.weight"]), "bias": _t(sd[f"{prefix}.bias"])}


def clip_vision_params_from_hf(model_or_state_dict) -> Dict[str, Any]:
    """HF ``CLIPVisionModel`` / ``CLIPModel.vision_model`` -> nn.vision pytree."""
    sd = (model_or_state_dict if isinstance(model_or_state_dict, dict)
          else model_or_state_dict.state_dict())
    # normalize key prefix: CLIPVisionModel uses "vision_model.", a bare
    # vision_model module uses none
    if any(k.startswith("vision_model.") for k in sd):
        sd = {k[len("vision_model."):]: v for k, v in sd.items()
              if k.startswith("vision_model.")}

    pe = _t(sd["embeddings.patch_embedding.weight"])  # (d, 3, p, p)
    d = pe.shape[0]
    layers = []
    i = 0
    while f"encoder.layers.{i}.layer_norm1.weight" in sd:
        p = f"encoder.layers.{i}"
        layers.append({
            "ln1": _ln(sd, f"{p}.layer_norm1"),
            "attn": {
                "q": _linear(sd, f"{p}.self_attn.q_proj"),
                "k": _linear(sd, f"{p}.self_attn.k_proj"),
                "v": _linear(sd, f"{p}.self_attn.v_proj"),
                "out": _linear(sd, f"{p}.self_attn.out_proj"),
            },
            "ln2": _ln(sd, f"{p}.layer_norm2"),
            "mlp": {"fc1": _linear(sd, f"{p}.mlp.fc1"),
                    "fc2": _linear(sd, f"{p}.mlp.fc2")},
        })
        i += 1

    return {
        "class_embedding": _t(sd["embeddings.class_embedding"]),
        "patch_embed": {"w": pe.reshape(d, -1).T},  # (3*p*p, d)
        "pos_embed": {"table": _t(sd["embeddings.position_embedding.weight"])},
        "pre_ln": _ln(sd, "pre_layrnorm"),
        "layers": layers,
        "post_ln": _ln(sd, "post_layernorm"),
    }


def load_clip_checkpoint(path: str) -> Dict[str, Any]:
    """File-based CLIP vision import: a local HF checkpoint file
    (``model.safetensors`` or torch ``pytorch_model.bin``, or a directory
    containing one) -> nn.vision pytree. This is the offline path for the
    laion ViT-L/14 weights the reference downloads at construction
    (/root/reference/kosmosx/model.py:154-156) — fetch the file once,
    convert here, no network at model build time.
    """
    import os

    if os.path.isdir(path):
        for name in ("model.safetensors", "pytorch_model.bin"):
            cand = os.path.join(path, name)
            if os.path.exists(cand):
                path = cand
                break
        else:
            raise FileNotFoundError(
                f"{path}: no model.safetensors / pytorch_model.bin")
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        sd: Dict[str, Any] = load_file(path)
    else:
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=True)
    # full CLIPModel checkpoints carry text_model.* too; the vision_model
    # prefix is stripped by clip_vision_params_from_hf
    return clip_vision_params_from_hf(sd)


# ---------------------------------------------------------------------------
# wav2vec2 / data2vec-audio (reference wires them pretrained:
# /root/reference/experimental/model/video/kosmos_video.py:126-128,
# /root/reference/experimental/model/allModalities/audio/kosmos_audio.py)
# ---------------------------------------------------------------------------

def _conv1d_w(sd, prefix) -> np.ndarray:
    """torch Conv1d weight (out, in/groups, k) -> ours (k, in/groups, out)."""
    return _t(sd[f"{prefix}.weight"]).transpose(2, 1, 0)


def _pos_conv_weight(sd, prefix) -> np.ndarray:
    """wav2vec2's positional conv is weight-normed (dim=2): fold
    ``g * v / ||v||`` into a plain kernel. Accepts both the modern
    parametrizations naming and legacy weight_g/weight_v."""
    for g_key, v_key in ((f"{prefix}.parametrizations.weight.original0",
                          f"{prefix}.parametrizations.weight.original1"),
                         (f"{prefix}.weight_g", f"{prefix}.weight_v")):
        if g_key in sd:
            g, v = _t(sd[g_key]), _t(sd[v_key])   # (1,1,k), (out,in/g,k)
            norm = np.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True))
            return (g * v / norm).transpose(2, 1, 0)
    return _conv1d_w(sd, prefix)  # already plain (folded or never normed)


def wav2vec2_params_from_hf(model_or_state_dict,
                            feat_norm: str = "group") -> Dict[str, Any]:
    """HF ``Wav2Vec2Model`` (or its state_dict) -> nn.wav2vec2 pytree.

    ``feat_norm``: "group" (base checkpoints) or "layer" (large /
    do_stable_layer_norm checkpoints) — must match the model's config."""
    sd = (model_or_state_dict if isinstance(model_or_state_dict, dict)
          else model_or_state_dict.state_dict())
    if any(k.startswith("wav2vec2.") for k in sd):  # ForCTC wrappers
        sd = {k[len("wav2vec2."):]: v for k, v in sd.items()
              if k.startswith("wav2vec2.")}

    convs = []
    i = 0
    while f"feature_extractor.conv_layers.{i}.conv.weight" in sd:
        p = f"feature_extractor.conv_layers.{i}"
        c: Dict[str, Any] = {"w": _conv1d_w(sd, f"{p}.conv")}
        if f"{p}.conv.bias" in sd:
            c["b"] = _t(sd[f"{p}.conv.bias"])
        if f"{p}.layer_norm.weight" in sd:  # GroupNorm (i==0) or LayerNorm
            c["norm"] = _ln(sd, f"{p}.layer_norm")
        i += 1
        convs.append(c)
    if feat_norm == "group" and "norm" not in convs[0]:
        raise KeyError("feat_norm='group' but conv 0 has no norm weights")

    params: Dict[str, Any] = {
        "convs": convs,
        "feat_proj": {"ln": _ln(sd, "feature_projection.layer_norm"),
                      **_linear(sd, "feature_projection.projection")},
        "enc_ln": _ln(sd, "encoder.layer_norm"),
    }
    if "encoder.pos_conv_embed.conv.bias" in sd or \
            "encoder.pos_conv_embed.conv.weight" in sd or \
            any("pos_conv_embed.conv.parametrizations" in k for k in sd):
        params["pos_conv"] = [{
            "w": _pos_conv_weight(sd, "encoder.pos_conv_embed.conv"),
            "b": _t(sd["encoder.pos_conv_embed.conv.bias"])}]
    else:  # data2vec: stacked plain convs
        pos = []
        i = 0
        while f"encoder.pos_conv_embed.layers.{i}.conv.weight" in sd:
            p = f"encoder.pos_conv_embed.layers.{i}.conv"
            pos.append({"w": _conv1d_w(sd, p), "b": _t(sd[f"{p}.bias"])})
            i += 1
        params["pos_conv"] = pos

    enc_layers = []
    i = 0
    while f"encoder.layers.{i}.layer_norm.weight" in sd:
        p = f"encoder.layers.{i}"
        enc_layers.append({
            "attn": {"q": _linear(sd, f"{p}.attention.q_proj"),
                     "k": _linear(sd, f"{p}.attention.k_proj"),
                     "v": _linear(sd, f"{p}.attention.v_proj"),
                     "out": _linear(sd, f"{p}.attention.out_proj")},
            "ln1": _ln(sd, f"{p}.layer_norm"),
            "mlp": {"fc1": _linear(sd, f"{p}.feed_forward.intermediate_dense"),
                    "fc2": _linear(sd, f"{p}.feed_forward.output_dense")},
            "ln2": _ln(sd, f"{p}.final_layer_norm"),
        })
        i += 1
    params["layers"] = enc_layers
    return params


def data2vec_audio_params_from_hf(model_or_state_dict) -> Dict[str, Any]:
    """HF ``Data2VecAudioModel`` (or ``Data2VecAudioForCTC``'s inner model
    state_dict with the ``data2vec_audio.`` prefix) -> nn.wav2vec2 pytree
    (use with ``Wav2Vec2Config(feat_norm="layer", pos_conv_mode="data2vec")``)."""
    sd = (model_or_state_dict if isinstance(model_or_state_dict, dict)
          else model_or_state_dict.state_dict())
    if any(k.startswith("data2vec_audio.") for k in sd):
        sd = {k[len("data2vec_audio."):]: v for k, v in sd.items()
              if k.startswith("data2vec_audio.")}
    return wav2vec2_params_from_hf(sd, feat_norm="layer")


# ---------------------------------------------------------------------------
# torchvision r3d_18 (reference video tower:
# /root/reference/experimental/model/video/kosmos_video.py:131-134)
# ---------------------------------------------------------------------------

def _fold_bn_into_conv3d(sd, conv_prefix, bn_prefix, eps=1e-5):
    """Eval-mode BatchNorm3d after a bias-free Conv3d is an exact affine map:
    fold it into the conv. torch Conv3d weight (out, in, kt, kh, kw) ->
    ours (kt, kh, kw, in, out), scaled per out-channel; bias = beta -
    mean * gamma / sqrt(var + eps)."""
    w = _t(sd[f"{conv_prefix}.weight"])
    gamma = _t(sd[f"{bn_prefix}.weight"])
    beta = _t(sd[f"{bn_prefix}.bias"])
    mean = _t(sd[f"{bn_prefix}.running_mean"])
    var = _t(sd[f"{bn_prefix}.running_var"])
    scale = gamma / np.sqrt(var + eps)
    w = w * scale[:, None, None, None, None]
    b = beta - mean * scale
    if f"{conv_prefix}.bias" in sd:
        b = b + _t(sd[f"{conv_prefix}.bias"]) * scale
    return {"w": w.transpose(2, 3, 4, 1, 0), "b": b}


def r3d18_params_from_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """torchvision ``r3d_18().state_dict()`` -> nn.video ``arch='r3d18'``
    pytree (BatchNorms folded; the fc head is ignored — the reference strips
    it too, kosmos_video.py:133-134)."""
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    params: Dict[str, Any] = {
        "stem": _fold_bn_into_conv3d(sd, "stem.0", "stem.1")}
    stages = []
    for s in range(1, 5):
        blocks = []
        for b in range(2):
            p = f"layer{s}.{b}"
            blk = {
                "conv1": _fold_bn_into_conv3d(sd, f"{p}.conv1.0",
                                              f"{p}.conv1.1"),
                "conv2": _fold_bn_into_conv3d(sd, f"{p}.conv2.0",
                                              f"{p}.conv2.1"),
                "down": (_fold_bn_into_conv3d(sd, f"{p}.downsample.0",
                                              f"{p}.downsample.1")
                         if f"{p}.downsample.0.weight" in sd else None),
            }
            blocks.append(blk)
        stages.append(blocks)
    params["stages"] = stages
    return params
