"""Test config: force an 8-device virtual CPU mesh before JAX is imported.

Mirrors the reference's dual-target strategy (its POSIX simulator build of
every ESP32 primitive, /root/reference/src/streamer.cpp:250-401): the whole
framework must run on CPU-backed JAX with a fake multi-chip mesh so decode
logic and shardings are testable without TPU hardware.
"""

import os

# Must be set before the first `import jax` anywhere in the test process.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# This image's sitecustomize force-registers the 'axon' TPU platform and
# overrides JAX_PLATFORMS; undo that so tests get the 8-device CPU mesh.
# (Set ESPFLIX_TEST_TPU=1 to run the suite against the real chip.)
if not os.environ.get("ESPFLIX_TEST_TPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0xE5BF11)
