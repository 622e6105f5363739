from kosmosx_tpu.nn import layers
from kosmosx_tpu.nn.attention import init_self_attention, self_attention
from kosmosx_tpu.nn.decoder import (
    decoder_forward,
    forward_embedding,
    init_cache,
    init_decoder,
    output_logits,
    run_layers,
)
from kosmosx_tpu.nn.moe import init_moe_ffn, moe_ffn
from kosmosx_tpu.nn.multiway import init_multiway, multiway_apply
from kosmosx_tpu.nn.resampler import init_resampler, resampler
from kosmosx_tpu.nn.vision import clip_vit, init_clip_vit, patchify
from kosmosx_tpu.nn.xpos import apply_xpos, xpos_sin_cos_scale

__all__ = [
    "layers",
    "init_self_attention", "self_attention",
    "decoder_forward", "forward_embedding", "init_cache", "init_decoder",
    "output_logits", "run_layers",
    "init_moe_ffn", "moe_ffn",
    "init_multiway", "multiway_apply",
    "init_resampler", "resampler",
    "clip_vit", "init_clip_vit", "patchify",
    "apply_xpos", "xpos_sin_cos_scale",
]
