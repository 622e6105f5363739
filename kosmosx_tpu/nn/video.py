"""Video encoder (r3d_18-style 3D resnet), JAX functional params.

Capability parity with torchvision ``r3d_18`` minus its classification head,
used by the reference's video variants
(/root/reference/experimental/model/video/kosmos_video.py:131-134): clip
(B, 3, T, H, W) -> pooled feature (B, 512).

TPU-first notes: 3D convs lower to XLA convolutions that tile onto the MXU;
we use NDHWC layout internally (channels-last is the TPU-native conv layout)
and a leaner stage plan than r3d_18 (stride-2 stems) — architecture parity at
the interface level (512-d clip embedding), not weight parity.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from kosmosx_tpu.core import initializers as init
from kosmosx_tpu.core.config import VideoConfig
from kosmosx_tpu.nn import layers


def _conv3d_init(key, k: Tuple[int, int, int], cin: int, cout: int):
    fan_in = cin * k[0] * k[1] * k[2]
    std = (2.0 / fan_in) ** 0.5  # he init
    return {"w": init.normal(key, k + (cin, cout), std=std),
            "b": init.zeros((cout,))}


def _conv3d(p, x, stride: Tuple[int, int, int], dtype, padding="SAME"):
    # x: (B, T, H, W, C); w: (kt, kh, kw, cin, cout). ``padding`` accepts
    # explicit [(lo, hi)]*3 — torchvision pads symmetrically, which differs
    # from XLA SAME alignment at even sizes, so the r3d18 path passes
    # torch-exact pads.
    from kosmosx_tpu.nn import layers
    out = jax.lax.conv_general_dilated(
        x.astype(dtype), layers.dense_weight(p["w"], dtype),
        window_strides=stride, padding=padding,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return out + p["b"].astype(dtype)


# ---------------------------------------------------------------------------
# faithful torchvision r3d_18 (arch="r3d18"): weight-parity topology; the
# BatchNorms that follow every conv in torchvision are FOLDED into the conv
# kernels/biases at conversion time (utils/hf_convert.r3d18_params_from_
# state_dict) — in eval mode BN is an affine map, so folding is exact and
# leaves a pure conv-relu resnet, the XLA-friendliest form.
# ---------------------------------------------------------------------------

_R3D18_PLANES = (64, 128, 256, 512)


def init_r3d18(key) -> Dict[str, Any]:
    """Random init with the converter's layout (identity-folded BNs)."""
    keys = jax.random.split(key, 1 + 4 * 2 * 3)
    ki = iter(range(len(keys)))
    params: Dict[str, Any] = {
        "stem": _conv3d_init(keys[next(ki)], (3, 7, 7), 3, 64)}
    stages = []
    cin = 64
    for planes in _R3D18_PLANES:
        blocks = []
        for b in range(2):
            blk = {
                "conv1": _conv3d_init(keys[next(ki)], (3, 3, 3), cin, planes),
                "conv2": _conv3d_init(keys[next(ki)], (3, 3, 3), planes,
                                      planes),
                "down": (_conv3d_init(keys[next(ki)], (1, 1, 1), cin, planes)
                         if (b == 0 and cin != planes) else None),
            }
            blocks.append(blk)
            cin = planes
        stages.append(blocks)
    params["stages"] = stages
    return params


def r3d18_encoder(params, clips, cfg: VideoConfig) -> jax.Array:
    """torchvision r3d_18 topology minus the classification head:
    clips (B, 3, T, H, W) -> (B, 512) avg-pooled clip embedding."""
    dtype = cfg.dtype
    p3 = [(1, 1), (1, 1), (1, 1)]        # torch padding=1 for 3x3x3
    x = jnp.transpose(clips, (0, 2, 3, 4, 1))  # NDHWC
    x = jax.nn.relu(_conv3d(params["stem"], x, (1, 2, 2), dtype,
                            padding=[(1, 1), (3, 3), (3, 3)]))
    for si, blocks in enumerate(params["stages"]):
        for bi, blk in enumerate(blocks):
            stride = (2, 2, 2) if (si > 0 and bi == 0) else (1, 1, 1)
            res = x
            h = jax.nn.relu(_conv3d(blk["conv1"], x, stride, dtype,
                                    padding=p3))
            h = _conv3d(blk["conv2"], h, (1, 1, 1), dtype, padding=p3)
            if blk["down"] is not None:
                res = _conv3d(blk["down"], res, stride, dtype,
                              padding=[(0, 0)] * 3)
            x = jax.nn.relu(h + res)
    return jnp.mean(x, axis=(1, 2, 3))  # (B, 512)


def init_video_encoder(key, cfg: VideoConfig) -> Dict[str, Any]:
    if cfg.arch == "r3d18":
        if cfg.hidden_dim != 512:
            raise ValueError("arch='r3d18' is the torchvision topology: "
                             "hidden_dim must be 512")
        return init_r3d18(key)
    return _init_lean(key, cfg)


def _init_lean(key, cfg: VideoConfig) -> Dict[str, Any]:
    keys = jax.random.split(key, 8)
    widths = [64, 128, 256, cfg.hidden_dim]
    params: Dict[str, Any] = {
        "stem": _conv3d_init(keys[0], (3, 7, 7), 3, widths[0]),
        "stem_ln": layers.init_layer_norm(widths[0]),
    }
    blocks = []
    cin = widths[0]
    for i, w in enumerate(widths):
        k1, k2, k3 = jax.random.split(keys[1 + i], 3)
        blocks.append({
            "conv1": _conv3d_init(k1, (3, 3, 3), cin, w),
            "ln1": layers.init_layer_norm(w),
            "conv2": _conv3d_init(k2, (3, 3, 3), w, w),
            "ln2": layers.init_layer_norm(w),
            "skip": (_conv3d_init(k3, (1, 1, 1), cin, w) if cin != w else None),
        })
        cin = w
    params["blocks"] = blocks
    return params


def video_encoder(params, clips, cfg: VideoConfig) -> jax.Array:
    """clips (B, 3, T, H, W) -> (B, hidden_dim) pooled clip embedding."""
    if cfg.arch == "r3d18":
        return r3d18_encoder(params, clips, cfg)
    dtype = cfg.dtype
    x = jnp.transpose(clips, (0, 2, 3, 4, 1))  # NDHWC
    x = _conv3d(params["stem"], x, (1, 2, 2), dtype)
    x = layers.layer_norm(params["stem_ln"], x)
    x = jax.nn.relu(x)
    for i, blk in enumerate(params["blocks"]):
        stride = (1, 1, 1) if i == 0 else (2, 2, 2)
        res = x
        h = _conv3d(blk["conv1"], x, stride, dtype)
        h = layers.layer_norm(blk["ln1"], h)
        h = jax.nn.relu(h)
        h = _conv3d(blk["conv2"], h, (1, 1, 1), dtype)
        h = layers.layer_norm(blk["ln2"], h)
        if blk["skip"] is not None or stride != (1, 1, 1):
            if blk["skip"] is not None:
                res = _conv3d(blk["skip"], res, stride, dtype)
            else:
                res = res[:, ::stride[0], ::stride[1], ::stride[2]]
        x = jax.nn.relu(h + res)
    return jnp.mean(x, axis=(1, 2, 3))  # global avg pool -> (B, C)
