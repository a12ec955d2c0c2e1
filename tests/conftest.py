"""Test configuration: force an 8-device virtual CPU mesh.

Tests never touch the real TPU — sharding and numerics are validated on CPU
with `--xla_force_host_platform_device_count=8` (the standard JAX fake-mesh
trick; SURVEY.md §4). Must run before jax initializes, hence the env setup
at import time.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
import jax  # noqa: E402

# The shell presets JAX_PLATFORMS=axon (real TPU tunnel) and the plugin
# ignores a plain env override — jax.config is authoritative.
jax.config.update("jax_platforms", "cpu")
# f32 matmuls/convs on CPU for bit-stable golden comparisons
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1337)
