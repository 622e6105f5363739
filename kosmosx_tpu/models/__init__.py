from kosmosx_tpu.models.language import KosmosLanguage
from kosmosx_tpu.models.kosmos import Kosmos
from kosmosx_tpu.models.conditional import KosmosConditional
from kosmosx_tpu.models.any_modality import (KosmosAny, ModalityDetector,
                                             ModalityProcessor)

__all__ = ["Kosmos", "KosmosLanguage", "KosmosConditional", "KosmosAny",
           "ModalityDetector", "ModalityProcessor"]
