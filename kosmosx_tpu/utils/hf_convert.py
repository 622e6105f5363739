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
