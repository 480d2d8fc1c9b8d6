"""Test config: run the suite on a virtual 8-device CPU mesh.

The axon TPU backend is experimental, SINGLE-chip, and reached over a slow
tunnel; per SURVEY.md §5/§8 tests run on CPU with
``xla_force_host_platform_device_count=8`` so the distributed (shard_map
DP) tests exercise real multi-device sharding without a TPU pod.

NOTE this environment preimports jax via a sitecustomize hook with
``JAX_PLATFORMS=axon`` already in the env, so setting env vars here is too
late for jax's module-level config — we must go through
``jax.config.update`` instead (backend *clients* are created lazily, so
this works as long as no test triggered ``jax.devices()`` at import time).
Set ``HIMAN_TEST_TPU=1`` to run the suite against the real chip.
"""

import os

# XLA_FLAGS is read when the CPU client is instantiated (lazily) — still
# early enough to request 8 virtual host devices here.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (already imported by sitecustomize — config still mutable)

if not os.environ.get("HIMAN_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_backend():
    if not os.environ.get("HIMAN_TEST_TPU"):
        assert jax.default_backend() == "cpu", (
            "tests must run on the virtual CPU mesh; backend is "
            f"{jax.default_backend()}"
        )
    yield


@pytest.fixture
def rng():
    return np.random.RandomState(0)
