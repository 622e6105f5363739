"""Backend-selection helpers.

Some environments force-register a PJRT plugin at interpreter startup (e.g.
a TPU tunnel via sitecustomize) and override the user's ``JAX_PLATFORMS``
choice. Entry points call :func:`honor_jax_platforms` before any device
query so CPU-mesh smoke runs behave as documented.
"""

from __future__ import annotations

import os


def honor_jax_platforms() -> None:
    """Re-apply ``JAX_PLATFORMS`` from the environment if set.

    Must run before the first ``jax.devices()`` call — the backend locks on
    first use. No-ops (and never raises) if the backend is already
    initialized or the env var is unset.
    """
    want = os.environ.get("JAX_PLATFORMS")
    if not want:
        return
    import jax

    try:
        jax.config.update("jax_platforms", want)
    except Exception:
        pass
