"""Test configuration: force an 8-device virtual CPU mesh before JAX init.

Sharding tests run on virtual CPU devices (the idiomatic way to test pjit/Mesh
layouts without a TPU pod); numerics tests compare against the reference
PyTorch implementation on CPU.
"""

import os

# Unconditional: the ambient environment may pin an accelerator platform
# (e.g. JAX_PLATFORMS=axon for the tunneled TPU); tests run on virtual CPUs.
os.environ["JAX_PLATFORMS"] = os.environ.get("QASR_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
