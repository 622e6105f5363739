"""Device-side image preprocessing (CLIP pixel normalization).

The reference preprocesses on the host through HF ``CLIPProcessor``
(/root/reference/kosmosx/model.py:82-99): resize to 224, center-crop,
rescale to [0,1], normalize with the CLIP mean/std. On TPU we do this on
device inside the jitted step — resize is a dense op XLA fuses well, and it
removes the host PIL bottleneck from the input pipeline (BASELINE.json north
star: "Image preprocessing ... execute device-side").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from kosmosx_tpu.nn.vision import CLIP_IMAGE_MEAN, CLIP_IMAGE_STD


def preprocess_images(images: jax.Array, *, image_size: int = 224,
                      rescale: bool = True, dtype=jnp.float32) -> jax.Array:
    """images (B, 3, H, W) uint8 [0,255] or float -> normalized
    (B, 3, image_size, image_size) pixel_values.

    Mirrors CLIPProcessor: bicubic resize of the short side + center crop,
    collapsed here into a single bicubic resize to the target square (equal
    for the common square inputs the reference feeds), /255 rescale, then
    (x - mean) / std per channel.
    """
    x = images.astype(jnp.float32)
    if rescale:
        # uint8 inputs arrive in [0, 255]; float inputs are assumed [0, 1]
        if jnp.issubdtype(images.dtype, jnp.integer):
            x = x / 255.0
    b, c, h, w = x.shape
    if (h, w) != (image_size, image_size):
        # resize short side then center-crop, like CLIPProcessor
        scale = image_size / min(h, w)
        nh, nw = round(h * scale), round(w * scale)
        x = jax.image.resize(x, (b, c, nh, nw), method="bicubic")
        top = (nh - image_size) // 2
        left = (nw - image_size) // 2
        x = jax.lax.dynamic_slice(
            x, (0, 0, top, left), (b, c, image_size, image_size))
    mean = jnp.asarray(CLIP_IMAGE_MEAN).reshape(1, 3, 1, 1)
    std = jnp.asarray(CLIP_IMAGE_STD).reshape(1, 3, 1, 1)
    x = (x - mean) / std
    return x.astype(dtype)
