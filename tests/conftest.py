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


def pytest_addoption(parser):
    parser.addoption(
        "--runslow",
        action="store_true",
        default=False,
        help="also run tests marked slow (the full CI-style tier)",
    )


def pytest_collection_modifyitems(config, items):
    """Two test tiers: the default run skips tests marked ``slow``
    (heavy mesh pipelines, interpret-mode kernel head-to-heads — each
    >= 10 s on the virtual CPU mesh) so the debug loop stays under
    ~8 min; ``pytest tests/ --runslow`` (or RUN_SLOW=1) runs all of
    them. Both tiers must stay green."""
    if config.getoption("--runslow") or os.environ.get("RUN_SLOW"):
        return
    skip = pytest.mark.skip(reason="slow tier: pass --runslow (or RUN_SLOW=1)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected >=8 virtual devices, got {len(devs)}"
    return devs[:8]
