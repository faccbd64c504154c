"""Test env setup — MUST run before jax is imported anywhere.

Forces an 8-device virtual CPU platform (our substitute for a real multi-chip
mesh, per SURVEY.md §4) and enables x64 so float64 parity tests against the
torch reference are meaningful.
"""
import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The axon sitecustomize imports jax at interpreter start with
# JAX_PLATFORMS=axon already set, so the env var alone is too late — force the
# platform through the live config instead.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Make the torch reference importable for golden-parity tests (read-only use;
# we compare outputs, we do not reuse its code).
REFERENCE_PATH = "/root/reference"
if os.path.isdir(REFERENCE_PATH) and REFERENCE_PATH not in sys.path:
    sys.path.insert(0, REFERENCE_PATH)

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Cap process-lifetime compiled-executable state.

    The full suite compiles many hundreds of programs (Pallas interpret
    variants, shard_map meshes, grad twins) in ONE process; with all of them
    kept alive, XLA:CPU's compiler segfaulted nondeterministically in late
    modules (observed twice inside backend_compile_and_load during
    test_sharding's seq-parallel compiles — each module passes alone).
    Dropping the executable caches between modules keeps the native-heap
    footprint bounded; cross-module cache reuse is negligible (each module
    uses its own shapes/configs), so the runtime cost is small.
    """
    yield
    jax.clear_caches()
