from kosmosx_tpu.generate.beam import beam_search, beam_search_multimodal
from kosmosx_tpu.generate.sampler import (
    SamplingConfig,
    generate_text,
    generate_multimodal,
    sample_logits,
)
from kosmosx_tpu.generate.speculative import speculative_generate

__all__ = ["SamplingConfig", "beam_search", "beam_search_multimodal",
           "generate_text",
           "generate_multimodal", "sample_logits", "speculative_generate"]
