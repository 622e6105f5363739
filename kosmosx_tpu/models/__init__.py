from kosmosx_tpu.models.language import KosmosLanguage
from kosmosx_tpu.models.kosmos import Kosmos

__all__ = ["Kosmos", "KosmosLanguage"]
