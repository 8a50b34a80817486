"""Platform-selection hardening for CLI entry points.

``JAX_PLATFORMS=cpu`` is supposed to pin the backend, but an injected
platform plugin (a ``sitecustomize`` registration hook) can initialise
its backend regardless of the env var — and a tunneled accelerator
backend whose link is down then HANGS inside native init forever, taking
the user's pipeline run with it. Mirroring the env var into
``jax.config`` is authoritative either way (the same pattern the test
conftest uses), so every CLI entry point calls this before first jax
use. Library code never does: a library must not assume or mutate the
platform (callers may configure jax themselves).
"""

from __future__ import annotations

import os


def honor_jax_platforms_env() -> None:
    """If JAX_PLATFORMS is set, pin jax.config to it (idempotent)."""
    value = os.environ.get("JAX_PLATFORMS")
    if not value:
        return
    import jax

    if jax.config.jax_platforms != value:
        jax.config.update("jax_platforms", value)
