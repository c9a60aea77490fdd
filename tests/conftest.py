"""Test configuration: force CPU with 8 virtual devices.

Multi-device (pjit/Mesh) tests exercise the same SPMD code path as real ICI
on an 8-device virtual CPU mesh (SURVEY.md §4). Must run before jax imports.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The image's sitecustomize.py pre-imports jax with JAX_PLATFORMS=axon before
# conftest runs; override the platform via config (backends are initialized
# lazily, so this still takes effect).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
