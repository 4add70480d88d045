"""Platform selection helper.

The deployment image's sitecustomize imports jax at interpreter start and
registers the axon TPU plugin, which can defeat a later ``JAX_PLATFORMS``
environment override.  CLI tools call this first to re-assert the user's
requested platform through jax.config before any backend is initialised.
"""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    plat = os.environ.get("JAX_PLATFORMS")
    if not plat:
        return
    import jax
    try:
        jax.config.update("jax_platforms", plat)
    except Exception:
        pass
