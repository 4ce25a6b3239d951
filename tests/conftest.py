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
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"  # in case jax is not yet imported

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free in-memory executables between test modules: long suites
    accumulated enough XLA-CPU state to segfault on the next big compile;
    compiled artifacts persist in .jax_cache so reloads stay cheap."""
    yield
    jax.clear_caches()
