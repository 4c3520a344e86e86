"""Test harness: virtual 8-device CPU mesh + float64.

The container's sitecustomize pins JAX_PLATFORMS=axon (the real TPU
tunnel); tests must run on a virtual CPU mesh instead (SURVEY.md §4), so we
override via jax.config before any backend initializes."""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
