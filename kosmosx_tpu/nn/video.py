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


def _conv3d(p, x, stride: Tuple[int, int, int], dtype):
    # x: (B, T, H, W, C); w: (kt, kh, kw, cin, cout)
    from kosmosx_tpu.nn import layers
    out = jax.lax.conv_general_dilated(
        x.astype(dtype), layers.dense_weight(p["w"], dtype),
        window_strides=stride, padding="SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return out + p["b"].astype(dtype)


def init_video_encoder(key, cfg: VideoConfig) -> Dict[str, Any]:
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
