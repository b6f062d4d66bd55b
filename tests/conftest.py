"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set env vars before jax is imported anywhere (SURVEY.md §4: multi-chip
logic tests run on CPU via xla_force_host_platform_device_count).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell exports axon (TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The axon TPU plugin's sitecustomize.py sets jax_platforms="axon,cpu" via
# jax.config at interpreter start, which overrides the env var — force it
# back before any backend initializes.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


def _build_native_lib():
    """Build native/libcolmap_fast.so once so the C++ bit-match test runs in
    the stock suite instead of silently skipping (needs only g++/make)."""
    import shutil
    import subprocess

    native_dir = os.path.join(os.path.dirname(__file__), "..", "native")
    so = os.path.join(native_dir, "libcolmap_fast.so")
    if os.path.exists(so) or shutil.which("make") is None:
        return
    try:
        subprocess.run(["make", "-C", native_dir], check=True,
                       capture_output=True, timeout=120)
    except (subprocess.SubprocessError, OSError):
        pass  # the native test skips with a clear message


_build_native_lib()


def stub_module(name: str):
    """A module stub that is SAFE to install in sys.modules.

    A bare ``types.ModuleType`` has ``__spec__ = None``, and
    ``importlib.util.find_spec`` RAISES ValueError for a sys.modules entry
    whose ``__spec__`` is None.  transformers probes ``torchvision`` that
    way at import time, so a bare stub installed by an earlier test file
    (the reference-code shims) broke ``test_dpt`` purely by test ordering.
    Attaching a real ModuleSpec makes find_spec return normally (and
    transformers then correctly classifies the package as unavailable
    because it has no distribution metadata).
    """
    import importlib.machinery
    import types

    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    return mod


@pytest.fixture
def rng():
    return np.random.default_rng(0)
