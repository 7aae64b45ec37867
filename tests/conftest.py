"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding logic is exercised without TPU hardware.

NOTE: this environment pre-registers an `axon` TPU plugin that overrides
JAX_PLATFORMS from the environment — `jax.config.update` after import is the
only reliable way to force CPU here (plain env vars are ignored).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import pytest  # noqa: E402

REFERENCE_DATA = "/root/reference/data"


@pytest.fixture(scope="session")
def ref_data_dir():
    return REFERENCE_DATA


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches_per_module():
    """Full slow-suite runs segfault the XLA CPU compiler after ~80
    accumulated compilations in one process (backend_compile_and_load
    SIGSEGV at ~81%, reproducible 2026-08-18; every module passes in
    isolation). Dropping compiled programs between modules keeps the
    compiler arena bounded at the cost of some recompiles."""
    yield
    jax.clear_caches()
