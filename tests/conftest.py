"""Test config: force an 8-device virtual CPU mesh before JAX initializes.

The TPU-native analogue of multi-node testing without a cluster (SURVEY.md §4):
all sharding tests run against 8 spoofed CPU devices.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# The axon TPU tunnel registers itself from sitecustomize.py and overrides
# jax_platforms; dropping its trigger env var keeps this a pure-CPU run even
# when tests launch inside the tunnel environment.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (import after env setup)
import pytest  # noqa: E402

# sitecustomize may already have forced jax_platforms="axon,cpu"; force it back.
jax.config.update("jax_platforms", "cpu")


@pytest.fixture
def key():
    return jax.random.key(0)
