from kosmosx_tpu.generate.sampler import (
    SamplingConfig,
    generate_text,
    generate_multimodal,
    sample_logits,
)

__all__ = ["SamplingConfig", "generate_text", "generate_multimodal",
           "sample_logits"]
