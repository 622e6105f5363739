from kosmosx_tpu.data.splice import splice_embeddings, splice_single
from kosmosx_tpu.data.images import preprocess_images

__all__ = ["splice_embeddings", "splice_single", "preprocess_images"]
