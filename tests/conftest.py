"""Test configuration: force an 8-device virtual CPU mesh.

The axon sitecustomize force-selects the TPU tunnel platform via
``jax.config.update("jax_platforms", "axon,cpu")`` at interpreter start, so
an env var alone is not enough — we override the config back to cpu here,
before any backend is initialized.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)
