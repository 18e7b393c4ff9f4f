"""Test environment: CPU backend with a virtual 8-device mesh, x64 on.

Swarm-level parallelism is validated on host CPU devices
(``xla_force_host_platform_device_count``) since multi-chip TPU hardware is
not available in CI; the sharding code paths are identical.
"""

import os
import pathlib

# The environment may pin JAX_PLATFORMS to a TPU tunnel; tests always run
# on the host CPU platform with 8 virtual devices.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402

REFERENCE = pathlib.Path(os.environ.get("LIGHTDOCK_REFERENCE", "/root/reference"))


@pytest.fixture(scope="session")
def reference_dir() -> pathlib.Path:
    if not REFERENCE.exists():
        pytest.skip("reference data not available")
    return REFERENCE
