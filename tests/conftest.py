"""Test configuration: force an 8-device virtual CPU mesh before JAX init.

Sharding tests run on virtual CPU devices (the idiomatic way to test pjit/Mesh
layouts without a TPU pod); numerics tests compare against the reference
PyTorch implementation on CPU.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# Unconditional: the ambient environment pins an accelerator platform via a
# site config (jax_platforms=axon,cpu) that overrides JAX_PLATFORMS; tests run
# on virtual CPUs unless QASR_TEST_PLATFORM says otherwise.
# QASR_TEST_PLATFORM=tpu means "run on the accelerator" — leave the ambient
# config in charge rather than forcing jax_platforms="tpu": the tunneled chip
# registers under the PLUGIN name "axon" (its backend still reports "tpu"),
# so a literal "tpu" platform list fails to initialize on this container
# ("No jellyfish device found") while a real TPU host works either way.
_plat = os.environ.get("QASR_TEST_PLATFORM", "cpu")
if _plat != "tpu":
    jax.config.update("jax_platforms", _plat)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture(autouse=True, scope="module")
def _bound_xla_cpu_state():
    """Drop compiled executables + tracing caches after every test module.

    The full suite compiles thousands of XLA:CPU programs in one process;
    with all of them kept live, runs reliably segfaulted INSIDE a later
    backend compile (~250 tests in, faulthandler stack ending in
    backend_compile_and_load — observed at different, code-state-dependent
    tests; host RAM was ample and the in-repo native C++ paths are
    ASan-clean, pointing at accumulated backend JIT state).  Clearing
    per-module trades some recompilation for a bounded executable
    population.

    Under the process-isolated runner (scripts/run_suite.sh, which sets
    QASR_SUITE_ISOLATED=1) each test file already gets a fresh interpreter,
    so the mitigation is skipped — the isolated suite passes WITHOUT it,
    bounding the unfixed upstream crash structurally rather than
    behaviorally.
    """
    yield
    if os.environ.get("QASR_SUITE_ISOLATED"):
        return
    import gc

    jax.clear_caches()
    gc.collect()
