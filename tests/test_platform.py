"""Tests for ucnerf_tpu.utils.platform — the persistent compile cache.

Why this exists: the CLIs previously set the ``JAX_COMPILATION_CACHE_DIR``
env var from script code, which is a silent no-op here — the TPU plugin's
sitecustomize imports jax at interpreter start, so jax's config had already
read the (unset) env var.  ``enable_compile_cache`` goes through
``jax.config.update`` instead, which works at any point before the first
compile.  These tests pin the contract: dir resolution, the explicit-env
override, the empty-string kill switch, and an actual cache write+hit.
"""

import os

import jax
import jax.numpy as jnp
import pytest

from ucnerf_tpu.utils.platform import enable_compile_cache


@pytest.fixture
def restore_cache_config():
    prev = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    prev_plat = jax.config.jax_platforms
    yield
    jax.config.update("jax_compilation_cache_dir", prev)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", prev_min)
    jax.config.update("jax_platforms", prev_plat)
    # restoring the CONFIG is not enough: jax initializes its persistent
    # cache instance at most once per process, so a test that triggered
    # initialization would leave a LIVE cache serving every later compile
    # in the suite (hermeticity leak; XLA:CPU AOT reloads also log
    # machine-feature warnings).  Drop the instance too.
    from jax._src import compilation_cache
    compilation_cache.reset_cache()


def test_env_var_overrides_default(tmp_path, monkeypatch,
                                   restore_cache_config):
    target = tmp_path / "cache"
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(target))
    used = enable_compile_cache(default_dir=str(tmp_path / "default"))
    assert used == str(target)
    assert os.path.isdir(target)                    # created eagerly
    assert jax.config.jax_compilation_cache_dir == str(target)


def test_empty_env_disables(monkeypatch, restore_cache_config):
    prev = jax.config.jax_compilation_cache_dir
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", "")
    assert enable_compile_cache() == ""
    assert jax.config.jax_compilation_cache_dir == prev  # untouched


def test_default_dir_expanduser(tmp_path, monkeypatch, restore_cache_config):
    monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
    monkeypatch.setenv("HOME", str(tmp_path))
    # this test process runs CPU-only (conftest); fake a TPU platform set
    # to exercise the default-dir path the CLIs hit on the chip
    jax.config.update("jax_platforms", "axon,cpu")
    used = enable_compile_cache(default_dir="~/jaxcache")
    assert used == str(tmp_path / "jaxcache")
    assert os.path.isdir(used)


def test_cpu_only_platform_skips_default(monkeypatch, restore_cache_config):
    """Without an explicit env var, a CPU-only platform set must NOT enable
    the cache (XLA:CPU persists host-specific AOT code; cache value is on
    the TPU's 20-40 s compiles)."""
    monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
    prev = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_platforms", "cpu")
    assert enable_compile_cache() == ""
    assert jax.config.jax_compilation_cache_dir == prev


def test_compiles_are_persisted(tmp_path, monkeypatch, restore_cache_config):
    """A jitted compile actually lands in the cache dir (the real contract —
    config wiring alone proved nothing when the env-var path silently
    no-opped)."""
    # jax initializes its persistent cache AT MOST ONCE per process and
    # ignores later dir changes; reset so this test controls the dir even
    # when an earlier test already triggered initialization
    from jax._src import compilation_cache
    compilation_cache.reset_cache()
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(tmp_path))
    enable_compile_cache()
    # tiny CPU compiles are below the default 1 s persistence threshold
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    @jax.jit
    def f(x):
        return jnp.sin(x) @ x.T

    f(jnp.ones((32, 32))).block_until_ready()
    entries = [p for p in os.listdir(tmp_path) if p.endswith("-cache")]
    assert entries, f"no cache entries written to {tmp_path}"
