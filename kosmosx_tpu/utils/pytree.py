"""Small pytree utilities."""

from __future__ import annotations

import jax


def param_count(tree) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))


def param_bytes(tree) -> int:
    return sum(x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(tree))


def tree_paths(tree):
    """Yield ('/'.join(path), leaf) pairs."""
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    for path, leaf in flat:
        yield "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path), leaf
