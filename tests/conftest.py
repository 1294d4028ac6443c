"""Test configuration: run the whole stack on a virtual 8-device CPU mesh.

This is the TPU-native analog of the reference's `device_type: cpu` escape
hatch (`puffer_phc/config.py:10-20`): every test runs without TPU hardware,
and the multi-chip sharding tests get 8 virtual devices via
`--xla_force_host_platform_device_count`.

NOTE: this sandbox sets JAX_PLATFORMS=axon (remote TPU tunnel with remote
compilation) in the environment and partially preloads jax, so the env var
cannot be overridden from here — `jax.config.update("jax_platforms", ...)`
is the only reliable switch.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
# XLA CPU compiles at full optimization are slow; optimization level does
# not affect numerics, only speed.
if "xla_backend_optimization_level" not in flags:
    flags += " --xla_backend_optimization_level=0"
os.environ["XLA_FLAGS"] = flags
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_compile"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
if os.environ.get("PHC_TEST_NO_CACHE"):
    # Escape hatch: the persistent cache's deserialize path has segfaulted
    # on repeated reads of the large PPO executable mid-suite (XLA CPU
    # backend; see git history 2026-08-18). Set PHC_TEST_NO_CACHE=1 to run
    # the suite with fresh compiles only.
    jax.config.update("jax_enable_compilation_cache", False)
else:
    # Persistent compile cache across pytest runs (default min-compile-time
    # 1s would skip caching most kernels).
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_compile")),
    )
