"""Test configuration: run the whole stack on a virtual 8-device CPU mesh.

This is the TPU-native analog of the reference's `device_type: cpu` escape
hatch (`puffer_phc/config.py:10-20`): every test runs without TPU hardware,
and the multi-chip sharding tests get 8 virtual devices via
`--xla_force_host_platform_device_count`.
"""

import os

# Must be set before jax is imported anywhere.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
# XLA CPU compiles at full optimization take minutes per program in this
# sandbox; optimization level does not affect numerics, only speed.
if "xla_backend_optimization_level" not in flags:
    flags += " --xla_backend_optimization_level=0"
os.environ["XLA_FLAGS"] = flags

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_compile")

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
# Persistent compile cache: XLA CPU compiles are slow in this sandbox (~0.5s
# per tiny kernel); caching across pytest runs keeps the suite fast.
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
