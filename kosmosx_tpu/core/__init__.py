from kosmosx_tpu.core.config import (
    MagnetoConfig,
    VisionConfig,
    ResamplerConfig,
    KosmosConfig,
)
