"""xPos (extrapolatable rotary) relative position encoding.

Replicates torchscale's XPOS semantics (the reference enables it via
``xpos_rel_pos=True`` at /root/reference/kosmosx/model.py:180; behavioral
notes at /root/reference/README.md:86):

- rotary angles use absolute positions ``offset .. offset+L-1`` with
  ``inv_freq = 10000**(-arange(half)/half)`` over *half* the head dim,
  applied in rotate-every-two / duplicate-interleave layout;
- a per-dim decay ``zeta = (arange(0, d, 2) + 0.4 d) / (1.4 d)`` raised to
  ``(pos - center) / scale_base``; queries are up-scaled (``zeta**power``),
  keys down-scaled (``zeta**-power``), so attention scores pick up the
  relative factor ``zeta**((i - j)/scale_base)`` — the center cancels exactly
  in q·k, so it only matters for numerical range.

For full-sequence forward we center like torchscale (``(L+offset)//2``).
For KV-cache decoding we must keep cached keys valid across steps, so callers
pass a *static* ``center`` (e.g. 0); scores are mathematically identical.

``offset`` may be a Python int, a traced scalar, or a per-batch ``(B,)``
array (decode steps with ragged cache lengths).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _rotate_every_two(x):
    """[x0, x1, x2, x3, ...] -> [-x1, x0, -x3, x2, ...] along the last axis."""
    x1 = x[..., ::2]
    x2 = x[..., 1::2]
    return jnp.stack((-x2, x1), axis=-1).reshape(x.shape)


def _duplicate_interleave(m):
    """(..., half) -> (..., 2*half) with each column repeated twice, interleaved."""
    return jnp.repeat(m, 2, axis=-1)


def xpos_sin_cos_scale(length: int, head_dim: int, *, offset=0,
                       scale_base: int = 512, center=None, dtype=jnp.float32):
    """Returns (sin, cos, scale), each (..., length, head_dim//2) where the
    leading dims come from a non-scalar ``offset``."""
    half = head_dim // 2
    offset = jnp.asarray(offset, jnp.float32)
    pos = offset[..., None] + jnp.arange(length, dtype=jnp.float32)  # (..., L)
    if center is None:
        center = (length + offset) // 2  # torchscale centering
    else:
        center = jnp.asarray(center, jnp.float32)
        if center.ndim:
            center = center[..., None]
    power = (pos - center) / float(scale_base)  # (..., L)
    zeta = (jnp.arange(0, head_dim, 2, dtype=jnp.float32) + 0.4 * head_dim) / (1.4 * head_dim)
    scale = zeta ** power[..., None]  # (..., L, half)

    inv_freq = 1.0 / (10000.0 ** (jnp.arange(0, half, dtype=jnp.float32) / half))
    sinusoid = pos[..., None] * inv_freq  # (..., L, half)
    sin = jnp.sin(sinusoid)
    cos = jnp.cos(sinusoid)
    return sin.astype(dtype), cos.astype(dtype), scale.astype(dtype)


def xpos_position_bound(scale_base: int = 512) -> int:
    """Largest absolute position at which the per-dim key downscale
    ``zeta**(-pos/scale_base)`` still fits fp32/bf16 range (both have 8
    exponent bits). The smallest zeta is dim 0: ``0.4d/1.4d = 2/7``
    (independent of head_dim); the scale overflows past
    ``pos > scale_base * 127 / log2(7/2)`` (~36k at scale_base 512).
    Cached decode keys are stored at absolute positions (center 0), so
    rolling-window generation must stay under this bound or scores go
    inf/NaN."""
    import math

    zeta0 = 0.4 / 1.4
    return int(scale_base * 127.0 / math.log2(1.0 / zeta0))


def recenter_scale(head_dim: int, delta, scale_base: int = 512,
                   dtype=jnp.float32):
    """Per-dim multiplier that moves a cached key's xPos decay center forward
    by ``delta`` positions: a key stored as ``k * zeta**(-(j - c)/sb)``
    becomes valid for center ``c + delta`` after multiplying by
    ``zeta**(delta/sb)`` (the query side then uses ``center=c+delta``, so the
    q·k product still carries exactly ``zeta**((i-j)/sb)``).

    ``delta`` may be scalar or (B,); returns (head_dim,) or (B, 1, 1,
    head_dim) ready to broadcast against a (B, H, L, head_dim) cache."""
    delta = jnp.asarray(delta, jnp.float32)
    zeta = (jnp.arange(0, head_dim, 2, dtype=jnp.float32)
            + 0.4 * head_dim) / (1.4 * head_dim)
    factor = _duplicate_interleave(
        zeta ** (delta[..., None] / float(scale_base)))
    if delta.ndim == 1:
        factor = factor[:, None, None, :]
    return factor.astype(dtype)


def apply_xpos(x, *, offset=0, scale_base: int = 512, downscale: bool = False,
               center=None):
    """Apply xPos rotation + scaling to ``x`` of shape (..., L, head_dim).

    ``downscale=True`` for keys (scale**-power), False for queries.
    ``offset`` may be scalar or (B,) for per-batch cache lengths (x must then
    be (B, ..., L, head_dim)). Math runs in fp32; result cast back to x.dtype.
    """
    orig_dtype = x.dtype
    length, head_dim = x.shape[-2], x.shape[-1]
    offset_arr = jnp.asarray(offset)
    sin, cos, scale = xpos_sin_cos_scale(
        length, head_dim, offset=offset, scale_base=scale_base, center=center)
    if downscale:
        scale = 1.0 / scale
    sin = _duplicate_interleave(sin * scale)  # (..., L, head_dim)
    cos = _duplicate_interleave(cos * scale)
    if offset_arr.ndim == 1:
        # per-batch tables: (B, L, hd) -> broadcast against x (B, ..., L, hd)
        extra = x.ndim - 3
        shape = (sin.shape[0],) + (1,) * extra + sin.shape[1:]
        sin = sin.reshape(shape)
        cos = cos.reshape(shape)
    x32 = x.astype(jnp.float32)
    out = x32 * cos + _rotate_every_two(x32) * sin
    return out.astype(orig_dtype)
