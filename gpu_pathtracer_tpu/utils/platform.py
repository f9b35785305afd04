"""Platform selection helper.

In this environment, sitecustomize imports jax at interpreter startup to
register the experimental 'axon' TPU plugin, which means the JAX_PLATFORMS
environment variable is read BEFORE user code (or even conftest) runs and
setting it later has no effect.  `jax.config.update("jax_platforms", ...)`
does work post-import, so every entry point calls this helper first.
"""

from __future__ import annotations

import os


def apply_platform_env(default: str | None = None) -> None:
    """Honor JAX_PLATFORMS (or `default`) via jax.config, post-import."""
    plat = os.environ.get("JAX_PLATFORMS") or default
    if not plat:
        return
    import jax

    try:
        jax.config.update("jax_platforms", plat)
    except Exception:
        pass
