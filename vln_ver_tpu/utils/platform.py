"""Platform selection helper.

The deployment image's sitecustomize imports jax at interpreter start and
registers the axon TPU plugin, which can defeat a later ``JAX_PLATFORMS``
environment override.  CLI tools call this first to re-assert the user's
requested platform through jax.config before any backend is initialised.
"""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    import jax
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass
    # persistent compile cache: on this 1-core host + remote-compile TPU
    # tunnel, recompiling the full model costs minutes per process.
    # ONE owner of the recipe (cache path + threshold): utils.bench.
    from .bench import enable_compile_cache
    enable_compile_cache()
