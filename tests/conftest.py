"""Test config: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize pre-registers the TPU PJRT plugin and pins
``JAX_PLATFORMS``, so the env-var route is dead — override via jax.config
before any backend initialization instead.
"""
import os

# Belt and braces for subprocesses spawned by tests.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected >=8 virtual devices, got {len(devs)}"
    return devs[:8]
