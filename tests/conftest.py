"""Test configuration.

Tests run on CPU with 8 virtual XLA devices so that multi-chip sharding
(mesh/pjit paths) is exercised without TPU hardware.  These env vars must be
set before the first `import jax` anywhere in the test process.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # force CPU even if the env points at TPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
# The suite's wall clock is dominated by XLA:CPU *compile* time (hundreds of
# jitted graphs, executed a handful of times each).  Dialing back backend
# optimization trades a little execution speed for ~35% less compile time;
# numerics are unchanged up to fp reassociation (same tolerance class as any
# XLA version bump).  Production/TPU runs are untouched — this is test-only.
if "xla_backend_optimization_level" not in flags:
    flags += " --xla_backend_optimization_level=0"
if "xla_llvm_disable_expensive_passes" not in flags:
    flags += " --xla_llvm_disable_expensive_passes=true"
# XLA:CPU's concurrency-optimized scheduler can deadlock the in-process
# communicator when independent model-axis subgroup collectives become ready
# in different orders on different virtual devices (see __graft_entry__.py).
# Program-order scheduling keeps multi-device tests deterministic; TPU runs
# never see this flag.
if "xla_cpu_enable_concurrency_optimized_scheduler" not in flags:
    flags += " --xla_cpu_enable_concurrency_optimized_scheduler=false"
os.environ["XLA_FLAGS"] = flags.strip()

# Repo root on sys.path so `import sambert_hifigan_tpu` works without install.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# This image pre-imports jax from a sitecustomize hook with JAX_PLATFORMS=axon
# (TPU) already set, so the env var above may be too late; the config update
# below still wins because the backend initializes lazily.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu", (
    "Tests must run on CPU with virtual devices; got " + jax.default_backend()
)
assert jax.device_count() >= 8, (
    f"Expected >=8 virtual CPU devices for sharding tests, got {jax.device_count()}"
)

# Persistent compile cache: the first full-suite run pays the XLA:CPU compile
# cost once; later runs (and re-runs of single files) load serialized
# executables in ms.  Also lets _drop_compiled_executables stay aggressive.
from sambert_hifigan_tpu.utils.jax_cache import enable as _enable_jax_cache  # noqa: E402

_enable_jax_cache()

import pytest  # noqa: E402


@pytest.fixture(scope="module", autouse=True)
def _drop_compiled_executables():
    """The suite compiles hundreds of XLA CPU executables (GAN steps,
    8-device meshes, Pallas interpret runs); pytest keeps them alive through
    jit caches and the process eventually aborts on memory near the end.
    Tests never share jits across modules, so drop the caches at each module
    boundary."""
    yield
    jax.clear_caches()
    import gc

    gc.collect()


@pytest.fixture(scope="session")
def rng():
    import numpy as np

    return np.random.default_rng(0)
