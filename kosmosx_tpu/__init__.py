"""kosmosx_tpu — a TPU-native (JAX / XLA / Pallas / pjit) multimodal LLM framework.

A from-scratch rebuild of the capabilities of kyegomez/Kosmos-X (KOSMOS-1-style
multimodal decoder: CLIP ViT-L/14 vision tower + Flamingo PerceiverResampler +
Magneto sub-LN decoder with xPos), re-designed TPU-first:

- functional param-pytree modules (no mutable nn.Module state) that jit/pjit cleanly
- Pallas flash-attention kernels for the hot loops (decoder self-attention,
  resampler cross-attention, ViT attention)
- SPMD parallelism via `jax.sharding.Mesh` + NamedSharding (data / fsdp / tensor
  axes) instead of NCCL process groups
- bf16 compute with fp32 softmax/LN discipline, remat on decoder layers

Public surface mirrors the reference package API (reference:
/root/reference/kosmosx/__init__.py:1-4 exports Kosmos, KosmosLanguage,
KosmosTokenizer) while adding what the reference lacks: a generation loop with
KV cache, a working training step, and multi-chip sharding.
"""

__version__ = "0.1.0"

from kosmosx_tpu.core.config import (
    MagnetoConfig,
    VisionConfig,
    ResamplerConfig,
    KosmosConfig,
)

_LAZY = {
    "Kosmos": "kosmosx_tpu.models.kosmos",
    "KosmosLanguage": "kosmosx_tpu.models.language",
    "KosmosConditional": "kosmosx_tpu.models.conditional",
    "KosmosAny": "kosmosx_tpu.models.any_modality",
    "KosmosTokenizer": "kosmosx_tpu.data.tokenizer",
    "SamplingConfig": "kosmosx_tpu.generate.sampler",
    "generate_text": "kosmosx_tpu.generate.sampler",
    "generate_multimodal": "kosmosx_tpu.generate.sampler",
    "speculative_generate": "kosmosx_tpu.generate.speculative",
    "Trainer": "kosmosx_tpu.train.trainer",
    "TrainConfig": "kosmosx_tpu.train.trainer",
    "flash_attention": "kosmosx_tpu.ops.flash_attention",
    "ServeEngine": "kosmosx_tpu.serve.engine",
    "ServeConfig": "kosmosx_tpu.serve.engine",
    "evaluate_perplexity": "kosmosx_tpu.eval.perplexity",
}


def __getattr__(name):  # lazy imports keep `import kosmosx_tpu` light
    if name in _LAZY:
        import importlib

        return getattr(importlib.import_module(_LAZY[name]), name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = [
    "Kosmos",
    "KosmosLanguage",
    "KosmosConditional",
    "KosmosAny",
    "KosmosTokenizer",
    "MagnetoConfig",
    "VisionConfig",
    "ResamplerConfig",
    "KosmosConfig",
    "SamplingConfig",
    "generate_text",
    "generate_multimodal",
    "speculative_generate",
    "Trainer",
    "TrainConfig",
    "flash_attention",
    "ServeEngine",
    "ServeConfig",
    "evaluate_perplexity",
]
