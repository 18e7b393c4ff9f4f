"""Test environment: CPU backend with a virtual 8-device mesh, x64 on.

Swarm-level parallelism is validated on host CPU devices
(``xla_force_host_platform_device_count``) since multi-chip TPU hardware is
not available in CI; the sharding code paths are identical.
"""

import os
import pathlib

# LIGHTDOCK_TPU_TESTS=1 switches the session to real-hardware mode: the
# tpu-marked tests run against the actual backend (compiled Mosaic kernels,
# f32) and everything else is skipped.  Run as:
#     LIGHTDOCK_TPU_TESTS=1 python -m pytest -m tpu tests/test_tpu.py
TPU_MODE = os.environ.get("LIGHTDOCK_TPU_TESTS") == "1"

if not TPU_MODE:
    # The environment may pin JAX_PLATFORMS to a TPU tunnel; tests always
    # run on the host CPU platform with 8 virtual devices.
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not TPU_MODE:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    for item in items:
        is_tpu = "tpu" in item.keywords
        if TPU_MODE and not is_tpu:
            item.add_marker(pytest.mark.skip(
                reason="CPU/x64 test skipped in LIGHTDOCK_TPU_TESTS mode"))
        elif not TPU_MODE and is_tpu:
            item.add_marker(pytest.mark.skip(
                reason="needs real TPU (LIGHTDOCK_TPU_TESTS=1 -m tpu)"))

REFERENCE = pathlib.Path(os.environ.get("LIGHTDOCK_REFERENCE", "/root/reference"))


@pytest.fixture(scope="session")
def reference_dir() -> pathlib.Path:
    if not REFERENCE.exists():
        pytest.skip("reference data not available")
    return REFERENCE


@pytest.fixture(scope="session")
def goldens_dir() -> pathlib.Path:
    return pathlib.Path(__file__).parent / "goldens"
