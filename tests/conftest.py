"""Test configuration: force CPU with 8 virtual devices.

Multi-device sharding tests run on a virtual CPU mesh
(``--xla_force_host_platform_device_count=8``), per SURVEY.md §4's note on
what the reference lacks: device-count-portable distributed tests.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin in this image ignores JAX_PLATFORMS from the
# environment; the config update after import reliably forces CPU.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture
def rng():
    return jax.random.PRNGKey(42)
