"""Test harness config.

- Forces CPU: the container exports JAX_PLATFORMS=axon (tunneled TPU) and a
  sitecustomize imports jax at interpreter startup, so the env var is already
  consumed — `jax.config.update("jax_platforms", ...)` is the only switch
  that still works here.  Tests must not fight the benchmark for the single
  real chip.
- Virtual 8-device CPU mesh for sharding tests (SURVEY.md §4).
- Persistent compilation cache: heavy pipelines compile once across runs.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
if "xla_backend_optimization_level" not in flags:
    # Tests are compile-time dominated on XLA:CPU; opt level 0 is ~4x
    # faster to compile at a small runtime cost.
    flags += " --xla_backend_optimization_level=0"
os.environ["XLA_FLAGS"] = flags.strip()
os.environ["JAX_PLATFORMS"] = "cpu"  # in case jax is not yet imported

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache for CPU test runs.  The loud
# "machine feature +prefer-no-gather is not supported" loader messages are
# false positives — those are LLVM *tuning preferences*, not ISA features
# (all actual ISA features match since cache entries are produced on this
# same container), and the AOT result loads and runs (verified: warm runs
# are ~4x faster end to end).
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free in-memory executables between test modules: long suites
    accumulated enough XLA-CPU state to segfault on the next big compile."""
    yield
    jax.clear_caches()
