"""Test harness: CPU backend + float64 + persistent compile cache.

The container's sitecustomize pins JAX_PLATFORMS=axon (the real TPU
tunnel); tests must run on CPU instead (SURVEY.md §4), so we override via
jax.config before any backend initializes.

Multi-device tests (the virtual 8-device mesh) run in a SUBPROCESS with
XLA_FLAGS=--xla_force_host_platform_device_count=8 (tests/test_sharding.py)
— forcing 8 virtual devices globally on this 2-core box has produced
segfaults inside XLA:CPU compilation when many programs compile in one
process.

The persistent compilation cache makes repeated suite runs (and the
estimator's big solver programs) compile once per machine, not once per
process."""
import os

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

_cache = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
