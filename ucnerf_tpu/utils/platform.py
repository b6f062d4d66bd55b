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


def enable_compile_cache(
        default_dir: str = "~/.cache/ucnerf_jax_cache") -> str:
    """Turn on JAX's persistent compilation cache; returns the dir used.

    Setting the ``JAX_COMPILATION_CACHE_DIR`` env var from CLI code is a
    silent no-op under the axon plugin — its sitecustomize imports jax at
    interpreter start, so jax's config already read the (then unset) env
    var.  Going through ``jax.config.update`` works at any point before
    the first compile, which is what this helper does.  Call it BEFORE the
    first compile: jax initializes its persistent cache at most once per
    process and ignores directory changes after that (the CLIs call this
    at import).

    Resolution: an explicit ``JAX_COMPILATION_CACHE_DIR`` env var wins;
    set-but-empty disables the cache entirely (returns ``""`` and leaves
    the config untouched); unset falls back to ``default_dir``
    (``~`` expanded) — but only when the configured platform set is not
    CPU-only: CPU compiles are fast and XLA:CPU persists host-specific AOT
    code whose reload trips machine-feature checks (log spam, and a real
    SIGILL risk if the cache dir ever migrates hosts), while the TPU
    entries the cache exists for (20-40 s compiles) are portable.  The
    directory is created eagerly so a first run on a fresh machine caches
    its compiles.
    """
    env = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if env is not None and env == "":
        return ""
    if not env:
        platforms = jax.config.jax_platforms or ""
        if {p.strip() for p in platforms.split(",") if p.strip()} == {"cpu"}:
            return ""
    cache_dir = env if env else os.path.expanduser(default_dir)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    return cache_dir
