"""Test configuration: force an 8-device virtual CPU mesh.

Tests exercise TPU-shaped code paths (shard_map / pjit over a Mesh) on the
CPU backend so the suite runs anywhere; the bench and driver run the same
code on real TPU chips.

Note: tunneled-TPU environments may force their platform via
``jax.config.update("jax_platforms", ...)`` in sitecustomize, which beats
the JAX_PLATFORMS env var — so we set the config explicitly after import.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
