"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding logic is exercised without TPU hardware."""

import os

# Force CPU: the environment pre-sets JAX_PLATFORMS to the TPU platform, and
# every tiny test graph would otherwise compile over the TPU tunnel (~100s
# per compile). Multi-chip logic is tested on 8 virtual CPU devices.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest  # noqa: E402

REFERENCE_DATA = "/root/reference/data"


@pytest.fixture(scope="session")
def ref_data_dir():
    return REFERENCE_DATA
