"""Multiway (two-expert, position-split) module wrapper.

The reference enables ``multiway=True`` on its torchscale decoder
(/root/reference/kosmosx/model.py:181). In torchscale, Multiway wraps every
linear projection and LayerNorm inside the decoder layers with *two* copies
("A" and "B") and routes tokens by a position split (BEiT-3 style: one expert
per modality). A decoder-only model never sets a split position, so every
token routes through expert A — but the parameters for expert B still exist
and double the per-layer parameter count. We replicate that layout so
parameter counts and checkpoint trees line up (SURVEY.md §2.6 "Multiway").

TPU-first notes: the split position is a *static* Python int (or None), so
the routed apply compiles to two dense sub-calls with static shapes — no
gather/scatter, no dynamic control flow inside jit.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp


def init_multiway(multiway: bool, key, init_fn: Callable[..., Any], *args, **kwargs):
    """Initialize a module's params; duplicated into {"A", "B"} when multiway."""
    if not multiway:
        return init_fn(key, *args, **kwargs)
    ka, kb = jax.random.split(key)
    return {"A": init_fn(ka, *args, **kwargs), "B": init_fn(kb, *args, **kwargs)}


def multiway_apply(multiway: bool, apply_fn: Callable, params, x,
                   split: Optional[int] = None, *args, **kwargs):
    """Apply ``apply_fn(params, x, ...)`` with optional two-expert routing.

    ``split``: static position along axis 1 (sequence). Positions < split go
    through expert A, the rest through expert B. ``None`` (the decoder-only
    default, torchscale split_position=-1) routes everything through A.
    """
    if not multiway:
        return apply_fn(params, x, *args, **kwargs)
    if split is None or split <= 0:
        return apply_fn(params["A"], x, *args, **kwargs)
    if split >= x.shape[1]:
        return apply_fn(params["B"], x, *args, **kwargs) if split == 0 else \
            apply_fn(params["A"], x, *args, **kwargs)
    ya = apply_fn(params["A"], x[:, :split], *args, **kwargs)
    yb = apply_fn(params["B"], x[:, split:], *args, **kwargs)
    return jnp.concatenate([ya, yb], axis=1)
