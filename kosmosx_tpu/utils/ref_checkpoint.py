"""Reference-checkpoint import/export: torch ``state_dict`` ⇄ param pytrees.

The reference's end state is a consolidated torch ``state_dict`` saved as
``checkpoints/final/final_model.pt`` (/root/reference/train.py:688-695). Its
module tree (/root/reference/kosmosx/model.py:149-206) is:

    clip_model         HF CLIPVisionTransformer        -> "clip_model.*"
    embed              bnb Embedding(32002, 2048)      -> "embed.weight"
    embed_positions    torchscale PositionalEmbedding  -> "embed_positions.weight"
    output_projection  nn.Linear(2048, 32002, no bias) -> "output_projection.weight"
    decoder            torchscale Decoder              -> "decoder.*"
    perceive           flamingo PerceiverResampler     -> "perceive.*"
    image_proj         nn.Linear(1024, 2048, no bias)  -> "image_proj.weight"

torchscale Decoder layout (reconstructed from SURVEY.md §2.1; multiway wraps
each sub-module in a MultiwayNetwork with ``A``/``B`` copies, sub-LN adds
``inner_attn_ln`` inside attention and ``ffn_layernorm`` inside the FFN):

    decoder.layers.{i}.self_attn.{q,k,v,out}_proj[.A|.B].{weight,bias}
    decoder.layers.{i}.self_attn.inner_attn_ln[.A|.B].{weight,bias}
    decoder.layers.{i}.self_attn_layer_norm[.A|.B].{weight,bias}
    decoder.layers.{i}.ffn[.A|.B].{fc1,fc2}.{weight,bias}
    decoder.layers.{i}.ffn[.A|.B].ffn_layernorm.{weight,bias}
    decoder.layers.{i}.final_layer_norm[.A|.B].{weight,bias}
    decoder.layer_norm[.A|.B].{weight,bias}

(The Decoder also re-registers the shared embed/pos/out_proj modules as
``decoder.embed_tokens`` / ``decoder.embed_positions`` /
``decoder.output_projection``; the importer accepts either alias.)

flamingo PerceiverResampler layout (flamingo-pytorch):

    perceive.latents                       (num_latents, dim)
    perceive.media_pos_emb                 (num_media_embeds, 1, dim)
    perceive.layers.{i}.0.{norm_media,norm_latents}.{weight,bias}
    perceive.layers.{i}.0.{to_q,to_kv,to_out}.weight
    perceive.layers.{i}.1.{0.weight,0.bias,1.weight,3.weight}   # LN, fc1, fc2
    perceive.norm.{weight,bias}

Conversion conventions: torch ``nn.Linear.weight`` is (out, in) — transposed
to our (in, out); LayerNorm ``weight``/``bias`` -> ``scale``/``bias``;
``media_pos_emb`` loses/gains its middle singleton axis.

Both directions are provided so the round-trip is testable without
torchscale/flamingo installed: ``state_dict_from_kosmos_params`` is the
consolidated-save analog, ``kosmos_params_from_state_dict`` the importer.
"""

from __future__ import annotations

from typing import Any, Dict, List

import numpy as np

from kosmosx_tpu.core.config import KosmosConfig, MagnetoConfig, ResamplerConfig
from kosmosx_tpu.utils.hf_convert import clip_vision_params_from_hf


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):  # torch tensor
        return np.asarray(x.detach().cpu().numpy(), dtype=np.float32)
    return np.asarray(x, dtype=np.float32)


def _sub(sd: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def _linear_in(sd, prefix) -> Dict[str, np.ndarray]:
    out = {"w": _np(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["b"] = _np(sd[f"{prefix}.bias"])
    return out


def _ln_in(sd, prefix) -> Dict[str, np.ndarray]:
    return {"scale": _np(sd[f"{prefix}.weight"]),
            "bias": _np(sd[f"{prefix}.bias"])}


def _mw_in(sd, prefix, leaf_fn, multiway: bool):
    """Import a possibly-MultiwayNetwork-wrapped submodule."""
    if multiway:
        return {"A": leaf_fn(sd, f"{prefix}.A"), "B": leaf_fn(sd, f"{prefix}.B")}
    return leaf_fn(sd, prefix)


def _ffn_in(sd, prefix) -> Dict[str, Any]:
    out = {"fc1": _linear_in(sd, f"{prefix}.fc1"),
           "fc2": _linear_in(sd, f"{prefix}.fc2")}
    if f"{prefix}.ffn_layernorm.weight" in sd:
        out["ffn_ln"] = _ln_in(sd, f"{prefix}.ffn_layernorm")
    return out


# ---------------------------------------------------------------------------
# import: reference state_dict -> pytree
# ---------------------------------------------------------------------------

def decoder_params_from_state_dict(sd: Dict[str, Any], cfg: MagnetoConfig,
                                   prefix: str = "decoder.") -> Dict[str, Any]:
    """torchscale-layout decoder keys -> ``nn.decoder.init_decoder`` pytree
    (list layout; use :func:`stack_layers` for ``scan_layers`` configs)."""
    mw = cfg.multiway
    layers_out: List[Dict[str, Any]] = []
    i = 0
    while any(k.startswith(f"{prefix}layers.{i}.") for k in sd):
        p = f"{prefix}layers.{i}"
        attn: Dict[str, Any] = {
            "q": _mw_in(sd, f"{p}.self_attn.q_proj", _linear_in, mw),
            "k": _mw_in(sd, f"{p}.self_attn.k_proj", _linear_in, mw),
            "v": _mw_in(sd, f"{p}.self_attn.v_proj", _linear_in, mw),
            "out": _mw_in(sd, f"{p}.self_attn.out_proj", _linear_in, mw),
        }
        if cfg.subln:
            attn["inner_ln"] = _mw_in(sd, f"{p}.self_attn.inner_attn_ln",
                                      _ln_in, mw)
        layers_out.append({
            "attn": attn,
            "attn_ln": _mw_in(sd, f"{p}.self_attn_layer_norm", _ln_in, mw),
            "ffn": _mw_in(sd, f"{p}.ffn", _ffn_in, mw),
            "final_ln": _mw_in(sd, f"{p}.final_layer_norm", _ln_in, mw),
        })
        i += 1
    if i != cfg.layers:
        raise ValueError(f"checkpoint has {i} decoder layers, config expects "
                         f"{cfg.layers}")

    out: Dict[str, Any] = {
        "layers": layers_out,
        "ln": _mw_in(sd, f"{prefix}layer_norm", _ln_in, mw),
    }

    # embeddings/projection live at the top level in the reference module,
    # with decoder-registered aliases (shared modules); accept either
    def pick(*names):
        for n in names:
            if n in sd:
                return _np(sd[n])
        raise KeyError(f"none of {names} in state_dict")

    out["embed"] = {"table": pick("embed.weight",
                                  f"{prefix}embed_tokens.weight")}
    out["pos"] = {"table": pick("embed_positions.weight",
                                f"{prefix}embed_positions.weight")}
    out["out_proj"] = {"w": pick("output_projection.weight",
                                 f"{prefix}output_projection.weight").T}
    return out


def resampler_params_from_state_dict(sd: Dict[str, Any],
                                     cfg: ResamplerConfig,
                                     prefix: str = "perceive.") -> Dict[str, Any]:
    """flamingo-pytorch PerceiverResampler keys -> ``init_resampler`` pytree."""
    media_pos = _np(sd[f"{prefix}media_pos_emb"])
    if media_pos.ndim == 3:  # flamingo stores (M, 1, dim)
        media_pos = media_pos[:, 0]
    layers_out = []
    for i in range(cfg.depth):
        a = f"{prefix}layers.{i}.0"
        f = f"{prefix}layers.{i}.1"
        layers_out.append({
            "attn": {
                "norm_media": _ln_in(sd, f"{a}.norm_media"),
                "norm_latents": _ln_in(sd, f"{a}.norm_latents"),
                "to_q": {"w": _np(sd[f"{a}.to_q.weight"]).T},
                "to_kv": {"w": _np(sd[f"{a}.to_kv.weight"]).T},
                "to_out": {"w": _np(sd[f"{a}.to_out.weight"]).T},
            },
            "ff": {
                # flamingo FeedForward = Sequential(LN, Linear, GELU, Linear)
                "norm": {"scale": _np(sd[f"{f}.0.weight"]),
                         "bias": _np(sd[f"{f}.0.bias"])},
                "fc1": {"w": _np(sd[f"{f}.1.weight"]).T},
                "fc2": {"w": _np(sd[f"{f}.3.weight"]).T},
            },
        })
    return {
        "latents": _np(sd[f"{prefix}latents"]),
        "media_pos_emb": media_pos,
        "layers": layers_out,
        "norm": _ln_in(sd, f"{prefix}norm"),
    }


def kosmos_params_from_state_dict(sd: Dict[str, Any],
                                  cfg: KosmosConfig) -> Dict[str, Any]:
    """Full reference ``final_model.pt`` state_dict -> ``Kosmos.init`` pytree."""
    sd = {k: v for k, v in sd.items()}
    params = {
        "clip": clip_vision_params_from_hf(_sub(sd, "clip_model.")),
        "resampler": resampler_params_from_state_dict(sd, cfg.resampler),
        "image_proj": {"w": _np(sd["image_proj.weight"]).T},
        "decoder": decoder_params_from_state_dict(sd, cfg.decoder),
    }
    if cfg.decoder.scan_layers:
        params["decoder"]["layers"] = stack_layers(params["decoder"]["layers"])
    return params


def load_reference_checkpoint(path: str, cfg: KosmosConfig) -> Dict[str, Any]:
    """Load the reference's consolidated ``final_model.pt``
    (/root/reference/train.py:688-695) into a ``Kosmos`` param pytree."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    # strip torch.compile / DDP / FSDP prefixes if present
    for junk in ("_orig_mod.", "module.", "_fsdp_wrapped_module."):
        if any(k.startswith(junk) for k in sd):
            sd = {k.replace(junk, ""): v for k, v in sd.items()}
    return kosmos_params_from_state_dict(sd, cfg)


# ---------------------------------------------------------------------------
# export: pytree -> reference state_dict
# ---------------------------------------------------------------------------

def _linear_out(out: Dict[str, Any], prefix: str, p: Dict[str, Any]):
    out[f"{prefix}.weight"] = _np(p["w"]).T
    if "b" in p:
        out[f"{prefix}.bias"] = _np(p["b"])


def _ln_out(out: Dict[str, Any], prefix: str, p: Dict[str, Any]):
    out[f"{prefix}.weight"] = _np(p["scale"])
    if "bias" in p:
        out[f"{prefix}.bias"] = _np(p["bias"])


def _mw_out(out, prefix, p, leaf_fn):
    if isinstance(p, dict) and "A" in p and "B" in p:
        leaf_fn(out, f"{prefix}.A", p["A"])
        leaf_fn(out, f"{prefix}.B", p["B"])
    else:
        leaf_fn(out, prefix, p)


def _ffn_out(out, prefix, p):
    _linear_out(out, f"{prefix}.fc1", p["fc1"])
    _linear_out(out, f"{prefix}.fc2", p["fc2"])
    if "ffn_ln" in p:
        _ln_out(out, f"{prefix}.ffn_layernorm", p["ffn_ln"])


def state_dict_from_decoder_params(params: Dict[str, Any],
                                   prefix: str = "decoder.",
                                   aliases: bool = True,
                                   ) -> Dict[str, np.ndarray]:
    """``init_decoder`` pytree -> torchscale-layout flat dict (numpy).

    ``aliases=True`` also emits the decoder-registered copies
    (``decoder.embed_tokens.weight`` / ``decoder.embed_positions.weight`` /
    ``decoder.output_projection.weight``): the reference's consolidated save
    contains BOTH names because the shared modules are registered twice
    (/root/reference/kosmosx/model.py:161-167,186-191), so a strict
    torchscale ``load_state_dict`` needs them present."""
    layer_list = params["layers"]
    if isinstance(layer_list, dict):  # stacked scan layout
        layer_list = unstack_layers(layer_list)
    out: Dict[str, np.ndarray] = {}
    for i, lp in enumerate(layer_list):
        p = f"{prefix}layers.{i}"
        _mw_out(out, f"{p}.self_attn.q_proj", lp["attn"]["q"], _linear_out)
        _mw_out(out, f"{p}.self_attn.k_proj", lp["attn"]["k"], _linear_out)
        _mw_out(out, f"{p}.self_attn.v_proj", lp["attn"]["v"], _linear_out)
        _mw_out(out, f"{p}.self_attn.out_proj", lp["attn"]["out"], _linear_out)
        if "inner_ln" in lp["attn"]:
            _mw_out(out, f"{p}.self_attn.inner_attn_ln",
                    lp["attn"]["inner_ln"], _ln_out)
        _mw_out(out, f"{p}.self_attn_layer_norm", lp["attn_ln"], _ln_out)
        _mw_out(out, f"{p}.ffn", lp["ffn"], _ffn_out)
        _mw_out(out, f"{p}.final_layer_norm", lp["final_ln"], _ln_out)
    _mw_out(out, f"{prefix}layer_norm", params["ln"], _ln_out)
    if "embed" in params:
        out["embed.weight"] = _np(params["embed"]["table"])
        out["embed_positions.weight"] = _np(params["pos"]["table"])
        out["output_projection.weight"] = _np(params["out_proj"]["w"]).T
        if aliases:
            out[f"{prefix}embed_tokens.weight"] = out["embed.weight"]
            out[f"{prefix}embed_positions.weight"] = \
                out["embed_positions.weight"]
            out[f"{prefix}output_projection.weight"] = \
                out["output_projection.weight"]
    return out


def state_dict_from_resampler_params(params: Dict[str, Any],
                                     prefix: str = "perceive.",
                                     ) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    out[f"{prefix}latents"] = _np(params["latents"])
    out[f"{prefix}media_pos_emb"] = _np(params["media_pos_emb"])[:, None]
    for i, lp in enumerate(params["layers"]):
        a, f = f"{prefix}layers.{i}.0", f"{prefix}layers.{i}.1"
        _ln_out(out, f"{a}.norm_media", lp["attn"]["norm_media"])
        _ln_out(out, f"{a}.norm_latents", lp["attn"]["norm_latents"])
        out[f"{a}.to_q.weight"] = _np(lp["attn"]["to_q"]["w"]).T
        out[f"{a}.to_kv.weight"] = _np(lp["attn"]["to_kv"]["w"]).T
        out[f"{a}.to_out.weight"] = _np(lp["attn"]["to_out"]["w"]).T
        out[f"{f}.0.weight"] = _np(lp["ff"]["norm"]["scale"])
        out[f"{f}.0.bias"] = _np(lp["ff"]["norm"]["bias"])
        out[f"{f}.1.weight"] = _np(lp["ff"]["fc1"]["w"]).T
        out[f"{f}.3.weight"] = _np(lp["ff"]["fc2"]["w"]).T
    _ln_out(out, f"{prefix}norm", params["norm"])
    return out


def state_dict_from_clip_params(params: Dict[str, Any],
                                prefix: str = "clip_model.",
                                ) -> Dict[str, np.ndarray]:
    """``nn.vision`` pytree -> HF CLIPVisionTransformer-layout flat dict."""
    out: Dict[str, np.ndarray] = {}
    out[f"{prefix}embeddings.class_embedding"] = _np(params["class_embedding"])
    pe = _np(params["patch_embed"]["w"]).T          # (d, 3*p*p)
    d = pe.shape[0]
    psq = pe.shape[1] // 3
    p_side = int(round(psq ** 0.5))
    out[f"{prefix}embeddings.patch_embedding.weight"] = pe.reshape(
        d, 3, p_side, p_side)
    out[f"{prefix}embeddings.position_embedding.weight"] = _np(
        params["pos_embed"]["table"])
    _ln_out(out, f"{prefix}pre_layrnorm", params["pre_ln"])
    for i, lp in enumerate(params["layers"]):
        p = f"{prefix}encoder.layers.{i}"
        _ln_out(out, f"{p}.layer_norm1", lp["ln1"])
        _linear_out(out, f"{p}.self_attn.q_proj", lp["attn"]["q"])
        _linear_out(out, f"{p}.self_attn.k_proj", lp["attn"]["k"])
        _linear_out(out, f"{p}.self_attn.v_proj", lp["attn"]["v"])
        _linear_out(out, f"{p}.self_attn.out_proj", lp["attn"]["out"])
        _ln_out(out, f"{p}.layer_norm2", lp["ln2"])
        _linear_out(out, f"{p}.mlp.fc1", lp["mlp"]["fc1"])
        _linear_out(out, f"{p}.mlp.fc2", lp["mlp"]["fc2"])
    _ln_out(out, f"{prefix}post_layernorm", params["post_ln"])
    return out


def state_dict_from_kosmos_params(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """``Kosmos`` pytree -> reference consolidated state_dict layout (numpy
    values; the analog of the final save at /root/reference/train.py:688-695)."""
    out = state_dict_from_clip_params(params["clip"])
    out.update(state_dict_from_resampler_params(params["resampler"]))
    out.update(state_dict_from_decoder_params(params["decoder"]))
    out["image_proj.weight"] = _np(params["image_proj"]["w"]).T
    return out


def save_reference_checkpoint(params: Dict[str, Any], path: str) -> None:
    """Save a ``Kosmos`` pytree as a reference-format torch checkpoint."""
    import torch

    sd = {k: torch.from_numpy(np.array(v, dtype=np.float32))
          for k, v in state_dict_from_kosmos_params(params).items()}
    torch.save(sd, path)


# ---------------------------------------------------------------------------
# scan-layout helpers
# ---------------------------------------------------------------------------

def stack_layers(layer_list: List[Dict[str, Any]]) -> Dict[str, Any]:
    """List-of-layer-pytrees -> stacked (L, ...) pytree for ``scan_layers``."""
    import jax

    return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *layer_list)


def unstack_layers(stacked: Dict[str, Any]) -> List[Dict[str, Any]]:
    """Stacked (L, ...) pytree -> list of per-layer pytrees."""
    import jax

    leaves = jax.tree_util.tree_leaves(stacked)
    n = leaves[0].shape[0]
    return [jax.tree_util.tree_map(lambda x: np.asarray(x[i]), stacked)
            for i in range(n)]
