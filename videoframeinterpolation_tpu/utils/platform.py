"""Restore standard ``JAX_PLATFORMS`` env semantics for CLI processes.

This image's ``sitecustomize`` registers the tunneled TPU plugin at
interpreter start and — inside the plugin's ``register()`` — calls
``jax.config.update("jax_platforms", "axon,cpu")``, which silently
OVERRIDES the ``JAX_PLATFORMS`` environment variable the user set for
the process. Upstream JAX reads the env var at config init; here the
plugin's explicit update wins, so ``JAX_PLATFORMS=cpu python train.py``
would still dispatch to the TPU (and collide with whatever TPU process
is already running — the tunnel allows one at a time).

Every CLI entry point calls :func:`honor_env_platform` before its first
backend use so the env var means what it means everywhere else. In-repo
tests force CPU the same way via ``tests/conftest.py``.
"""

from __future__ import annotations

import os


def honor_env_platform() -> None:
    """Re-apply ``JAX_PLATFORMS`` from the environment, if set.

    Must run before the first JAX backend use (backend init is lazy, so
    any time before the first array op / ``jax.devices()`` works). A
    no-op when the variable is unset or already effective.
    """
    platforms = os.environ.get("JAX_PLATFORMS")
    if not platforms:
        return
    import jax

    if jax.config.jax_platforms != platforms:
        jax.config.update("jax_platforms", platforms)
