"""Make an explicit ``JAX_PLATFORMS`` env var actually win.

The axon TPU plugin's sitecustomize sets ``jax_platforms="axon,cpu"`` via
``jax.config`` at interpreter start, which silently OVERRIDES the
``JAX_PLATFORMS`` environment variable — ``xla_bridge.backends()`` then
initializes the axon backend even for a run the user pinned to CPU (and
hangs if the TPU tunnel is down; CLAUDE.md axon gotcha #4).  Calling
:func:`honor_jax_platforms_env` right after ``import jax`` (before any
backend initializes) restores standard JAX semantics: an explicit env var
wins, an unset one leaves the plugin's default alone.
"""

import os

import jax


def honor_jax_platforms_env() -> None:
    env = os.environ.get("JAX_PLATFORMS")
    if env:
        jax.config.update("jax_platforms", env)
