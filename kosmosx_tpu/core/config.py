"""Configuration dataclasses for every model family in the framework.

These replace the reference's scattered configuration surfaces:
- torchscale ``DecoderConfig`` instantiated at /root/reference/kosmosx/model.py:170-183
  (24L / 2048d / 8192ffn / 32h, subln, xpos, multiway) -> ``MagnetoConfig``
- the hard-coded CLIP ViT-L/14 tower (/root/reference/kosmosx/model.py:154-156)
  -> ``VisionConfig`` (defaults reproduce laion CLIP-ViT-L-14 vision_model)
- ``PerceiverResampler(...)`` kwargs (/root/reference/kosmosx/model.py:196-203)
  -> ``ResamplerConfig``
- the implicit composition constants of ``Kosmos.__init__``
  (/root/reference/kosmosx/model.py:149-206) -> ``KosmosConfig``

All configs are frozen dataclasses so they are hashable and can be closed over
by jitted functions as static values.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp

# jnp dtypes are not hashable-friendly in dataclass defaults across jax
# versions; store dtype names and expose resolved dtypes via properties.
_DTYPES = {
    "float32": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "float16": jnp.float16,
}


def resolve_dtype(name: str):
    return _DTYPES[name]


@dataclasses.dataclass(frozen=True)
class MagnetoConfig:
    """Magneto (sub-LN) decoder configuration.

    Defaults replicate the reference decoder at
    /root/reference/kosmosx/model.py:170-191 — note the reference passes
    ``vocab_size=64007`` to DecoderConfig but its embedding / output projection
    are 32002 (/root/reference/kosmosx/model.py:161-167), so the effective
    vocab is 32002 (defect ledger SURVEY.md §2.6.2). We default to the
    *effective* value.
    """

    vocab_size: int = 32002
    embed_dim: int = 2048
    ffn_dim: int = 8192
    layers: int = 24
    heads: int = 32
    # Learned positional table: reference uses PositionalEmbedding(2048, 2048, 1)
    # (/root/reference/kosmosx/model.py:164). Rows includes padding_idx+1 offset
    # headroom in the fairseq convention: usable length = max_positions - padding_idx - 1.
    max_positions: int = 2048
    padding_idx: int = 1
    dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.0
    activation: str = "gelu"
    subln: bool = True
    multiway: bool = True
    xpos_rel_pos: bool = True
    xpos_scale_base: int = 512
    # embed_scale = sqrt(embed_dim) applied to token embeddings (fairseq /
    # torchscale "scale_embedding"; the double application of this factor is
    # the reference's double-scale quirk, SURVEY.md §2.6.1)
    scale_embedding: bool = True
    # numerics / execution
    compute_dtype: str = "float32"
    # torchscale computes the FFN activation in fp32 (``activation_fn(
    # x.float())``) — kept True for parity. NOTE (measured, BASELINE.md
    # gelu-variant study): False does NOT make the flagship faster — the
    # 34.1 ms activation cost is the erf transcendental, not the fp32
    # cast. The perf lever for from-scratch training is
    # ``activation="gelu_tanh"`` (−30.6 ms, ~9% of the batch-6 forward),
    # a different (standard) activation — not checkpoint-parity with erf.
    activation_fp32: bool = True
    use_flash_attention: bool = True
    # 1024x1024 measured fastest on v5e for the flagship at seq 2048
    # (BASELINE.md block sweep); flash_attention clamps to the sequence
    flash_block_q: int = 1024
    flash_block_kv: int = 1024
    remat: bool = False
    # jax.checkpoint policy when remat=True: "nothing" (recompute all),
    # "dots" (save matmul outputs, recompute elementwise — usually the best
    # FLOPs/HBM trade on TPU), "dots_no_batch" (save non-batch matmuls)
    remat_policy: str = "nothing"
    # scan the layer stack (compile-time win for deep models)
    scan_layers: bool = False
    # Sequence/context parallelism: name of the mesh axis the sequence
    # dimension is sharded over. When set, the model must run inside
    # shard_map with activations sharded on that axis; attention runs the
    # ppermute ring (parallel/ring_attention.py) and positions/xPos use each
    # shard's global offset. None = single-shard sequence (default).
    sequence_axis: Optional[str] = None
    # "ring": contiguous shards, upper-triangle pairs computed-and-discarded;
    # "zigzag": load-balanced schedule (device i holds global chunks
    # (i, 2S-1-i)) — ~2x less attention compute at large S. Data must be in
    # the zigzag layout (parallel/ring_attention.zigzag_permute).
    sequence_schedule: str = "ring"
    # KV-cache storage dtype for decode: None = compute dtype; "int8" =
    # per-position-per-head symmetric int8 codes + fp32 scales (halves the
    # cache read bandwidth at decode; dequant fuses into the attention
    # matmuls like the W8 weight path — see BASELINE.md study).
    kv_cache_dtype: Optional[str] = None
    # Rolling KV window for unbounded generation (StreamingLLM-style):
    # > 0 bounds the decode cache to kv_window positions — the first
    # kv_sink positions are pinned (attention sinks) and the rest is a
    # ring buffer, so memory is O(window) at any generation length.
    # Positions past the learned table cap are clamped to its last row
    # (the xPos rotation stays exact/absolute). 0 = full append-only cache.
    kv_window: int = 0
    kv_sink: int = 4
    # Unroll the layer loop for cached DECODE steps even when scan_layers,
    # over PER-LAYER cache buffers (a list, not one stacked array): inside
    # lax.scan each layer's (B, H, max_len, hd) cache slice is
    # dynamic-slice-copied out of the stacked carry and copied back — ~4x
    # the cache bytes per token. Unrolled over separate buffers the layer
    # index is STATIC and each update aliases in place. Measured on-chip
    # (flagship, batch 8 — BASELINE.md decode-unroll section): pool 320
    # unroll 1221 tok/s vs scan 912; pool 512: 962 vs 702; pool 1216:
    # 566 vs 268 (2.1x). NOTE an unroll with static .at[li] indices into
    # the one STACKED array measured SLOWER than the scan (226 at pool
    # 1216) — separate buffers are the whole win. Costs one-time compile
    # (~2x) of decode programs; prefill/training keep the scan.
    decode_unroll: bool = True
    # Only unroll when the cache pool is at least this long. 0 = always —
    # the unroll won at every pool length measured (see above). generate_*
    # unstacks once outside its token scan; the serving engine goes
    # further and HOLDS its pool as per-layer buffers from construction
    # (ServeEngine._pool_layout; override via ServeConfig.unroll_min_len).
    # Pool length is static (a cache shape), so the choice is
    # per-compiled-program, not per-request.
    decode_unroll_min_len: int = 0
    # Pallas single-query decode-attention kernel (ops/decode_attention.py):
    # streams the KV cache on the VPU instead of XLA's M=1 MXU einsums and
    # skips DMA past each row's valid length. Applies to L=1 cached steps
    # without a shared prefix; other shapes keep the einsum path. Default
    # off pending the on-chip study (benchmarks/decode_attn_study.py).
    decode_attn_kernel: bool = False
    # Mixture-of-experts FFN (nn/moe.py). 0 = dense FFN (reference parity;
    # the reference's only expert structure is the static multiway split).
    # >0 replaces every layer's FFN with a token-routed MoE of that many
    # experts; multiway then applies to attention/LN only. Expert weights
    # carry a leading (E, ...) axis sharded over the mesh's ``expert`` axis.
    moe_experts: int = 0
    moe_top_k: int = 2
    # per-group (= per batch row) expert buffer headroom; overflow tokens
    # ride the residual unchanged (Switch drop semantics)
    moe_capacity_factor: float = 1.25
    # combined into the single aux scalar the decoder returns with_aux=True
    moe_aux_weight: float = 0.01
    moe_z_weight: float = 1e-3

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.heads

    @property
    def dtype(self):
        return resolve_dtype(self.compute_dtype)

    @property
    def embed_scale(self) -> float:
        return float(self.embed_dim) ** 0.5 if self.scale_embedding else 1.0

    @property
    def max_target_positions(self) -> int:
        """Longest sequence the learned positional table can index.

        fairseq convention: position ids are ``padding_idx + 1 + arange(L)``,
        so the largest valid L satisfies ``padding_idx + L <= max_positions - 1``.
        """
        return self.max_positions - self.padding_idx - 1


@dataclasses.dataclass(frozen=True)
class VisionConfig:
    """CLIP ViT vision tower. Defaults = ViT-L/14 (laion/CLIP-ViT-L-14-laion2B
    vision_model, referenced at /root/reference/kosmosx/model.py:154-156):
    24 layers, 1024 dim, 16 heads, 14x14 patches on 224x224 -> 256 patches
    + 1 CLS = 257 output tokens of dim 1024."""

    image_size: int = 224
    patch_size: int = 14
    hidden_dim: int = 1024
    layers: int = 24
    heads: int = 16
    mlp_dim: int = 4096
    layer_norm_eps: float = 1e-5
    # laion 2B CLIP uses standard gelu; OpenAI CLIP uses quick_gelu.
    activation: str = "gelu"
    compute_dtype: str = "float32"
    use_flash_attention: bool = True
    remat: bool = False

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def seq_len(self) -> int:
        return self.num_patches + 1  # + CLS

    @property
    def head_dim(self) -> int:
        return self.hidden_dim // self.heads

    @property
    def dtype(self):
        return resolve_dtype(self.compute_dtype)


@dataclasses.dataclass(frozen=True)
class ResamplerConfig:
    """Flamingo-style PerceiverResampler. Defaults replicate
    /root/reference/kosmosx/model.py:196-203: dim=1024, depth=2, dim_head=64,
    heads=8, num_latents=64, num_media_embeds=257 (256 patches + CLS)."""

    dim: int = 1024
    depth: int = 2
    dim_head: int = 64
    heads: int = 8
    num_latents: int = 64
    num_media_embeds: int = 257
    ff_mult: int = 4
    compute_dtype: str = "float32"

    @property
    def inner_dim(self) -> int:
        return self.dim_head * self.heads

    @property
    def dtype(self):
        return resolve_dtype(self.compute_dtype)


@dataclasses.dataclass(frozen=True)
class KosmosConfig:
    """Full multimodal composition (reference Kosmos, /root/reference/kosmosx/model.py:132-253)."""

    decoder: MagnetoConfig = MagnetoConfig()
    vision: VisionConfig = VisionConfig()
    resampler: ResamplerConfig = ResamplerConfig()
    # linear projection resampler-dim -> decoder-dim (/root/reference/kosmosx/model.py:205-206)
    image_embed_len: int = 64
    # images are spliced into the embedding sequence after [BOS, <image>]
    # (/root/reference/kosmosx/model.py:239-241 splices at [:, 0:2]).
    splice_index: int = 2
    # The reference re-applies embed_scale to the already-scaled spliced
    # embedding (double-scale quirk, SURVEY.md §2.6.1). parity_double_scale=True
    # reproduces the reference arithmetic exactly; False applies the sane
    # single scale.
    parity_double_scale: bool = True

    @property
    def dtype(self):
        return self.decoder.dtype


@dataclasses.dataclass(frozen=True)
class Wav2Vec2Config:
    """Faithful wav2vec2 / data2vec-audio encoder shape (HF
    ``Wav2Vec2Model`` / ``Data2VecAudioModel`` semantics — the towers the
    reference's video variant wires pretrained at
    /root/reference/experimental/model/video/kosmos_video.py:126-128).
    Weight-parity target for utils/hf_convert converters."""

    hidden_dim: int = 768
    layers: int = 12
    heads: int = 12
    mlp_dim: int = 3072
    conv_dim: Tuple[int, ...] = (512, 512, 512, 512, 512, 512, 512)
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_bias: bool = False
    # "group": GroupNorm(groups=channels) after conv 0 only (wav2vec2-base);
    # "layer": per-layer LayerNorm over channels (data2vec / wav2vec2-large)
    feat_norm: str = "group"
    pos_conv_kernel: int = 128
    pos_conv_groups: int = 16
    # "wav2vec2": ONE weight-normed grouped conv (folded at conversion);
    # "data2vec": pos_convs stacked grouped convs each followed by an
    # affine-less LayerNorm + gelu
    pos_conv_mode: str = "wav2vec2"
    pos_convs: int = 5
    # False: post-LN encoder layers (wav2vec2-base / data2vec-audio);
    # True: pre-LN ("stable layer norm", wav2vec2-large)
    stable_layer_norm: bool = False
    layer_norm_eps: float = 1e-5
    compute_dtype: str = "float32"

    @property
    def dtype(self):
        return resolve_dtype(self.compute_dtype)


@dataclasses.dataclass(frozen=True)
class AudioConfig:
    """Audio encoder config.

    ``arch="framed"``: the lightweight TPU-first framed-matmul conv +
    transformer encoder (capability parity with the experimental towers,
    /root/reference/experimental/model/allModalities/audio/kosmos_audio.py).
    ``arch="wav2vec2"``: the faithful HF-architecture encoder (``w2v``
    shape) — loadable from real wav2vec2/data2vec checkpoints via
    utils/hf_convert."""

    hidden_dim: int = 768
    layers: int = 4
    heads: int = 12
    mlp_dim: int = 3072
    conv_widths: Tuple[int, ...] = (512, 512, 512)
    arch: str = "framed"
    w2v: Wav2Vec2Config = Wav2Vec2Config()
    compute_dtype: str = "float32"

    @property
    def dtype(self):
        return resolve_dtype(self.compute_dtype)


@dataclasses.dataclass(frozen=True)
class VideoConfig:
    """3D-conv video encoder config (capability parity with torchvision r3d_18
    at /root/reference/experimental/model/video/kosmos_video.py:131-134).

    ``arch="lean"``: the TPU-first LayerNorm resnet (interface parity).
    ``arch="r3d18"``: the faithful torchvision r3d_18 topology (BatchNorms
    folded into convs at conversion) — loadable from real checkpoints via
    utils/hf_convert; requires ``hidden_dim=512``."""

    hidden_dim: int = 512
    frame_size: int = 112
    arch: str = "lean"
    compute_dtype: str = "float32"

    @property
    def dtype(self):
        return resolve_dtype(self.compute_dtype)
