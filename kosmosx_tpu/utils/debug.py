"""Debug/sanitizer hooks.

The reference has no runtime sanitizers (SURVEY.md §5 race-detection row:
only CodeQL static analysis in CI). JAX-native equivalents:

- ``enable_nan_debugging()``: jax_debug_nans — aborts the first op producing
  NaN with a full traceback (the moral equivalent of a numeric sanitizer);
- ``checked(fn)``: checkify wrapper surfacing index-out-of-bounds / NaN /
  div-by-zero from inside jit as real errors;
- ``assert_finite(tree)``: eager finiteness scan over a pytree (the working
  version of the reference's NaN/Inf grad scan,
  /root/reference/tests/test_kosmos.py:25-38).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import checkify


def enable_nan_debugging(enable: bool = True) -> None:
    jax.config.update("jax_debug_nans", enable)


def checked(fn, errors=checkify.all_checks):
    """Wrap ``fn`` with checkify: returns (err, out); call err.throw()."""
    return checkify.checkify(fn, errors=errors)


def assert_finite(tree, name: str = "tree") -> None:
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            if not bool(jnp.all(jnp.isfinite(leaf))):
                bad.append("/".join(str(getattr(p, "key", p)) for p in path))
    if bad:
        raise FloatingPointError(f"non-finite values in {name}: {bad[:10]}")
