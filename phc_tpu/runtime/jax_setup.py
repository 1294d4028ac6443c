"""Persistent-compile-cache setup.

On this TPU backend every HLO module is compiled remotely (~0.4s per tiny
module, minutes for the fused train step), and local AOT compilation is
unavailable (libtpu version mismatch), so the persistent cache is the only
thing standing between a run and a 10-minute cold start. The
`JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS` env var is not honored by this
jax build (the default 1s threshold silently skips caching most modules),
so the knobs must be set through `jax.config` — call `setup_cache()` right
after importing jax, before any computation.
"""

import os


def setup_cache(cache_dir: str | None = None) -> None:
    import jax

    # `or`-chain so a SET-BUT-EMPTY env var falls through to the default
    # (makedirs('') raises; an empty var was the r4 suite's order-dependent
    # test_mode_sweep_tiny failure, leaked by the old __graft_entry__)
    cache_dir = (
        cache_dir
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or os.path.expanduser("~/.cache/jax_compile")
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    # Policy/discriminator matmuls run single-pass bf16 on the MXU (fp32
    # default lowers to a multi-pass emulation ~6x slower — measured 16 vs
    # ~95 TFLOP/s effective on v5e). This matches the reference's effective
    # training precision (torch TF32 on Ampere). Dynamics-critical
    # contractions in physics/ pin their own Precision.HIGH explicitly and
    # are unaffected by this default.
    jax.config.update("jax_default_matmul_precision", "bfloat16")
