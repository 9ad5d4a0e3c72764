"""Test harness: force the CPU backend with 8 virtual devices so multi-chip
sharding paths are exercised without TPU hardware (SURVEY.md §4d).

Note: in this image jax is pre-imported by a sitecustomize hook with
JAX_PLATFORMS=axon already set, so plain env-var defaults are too late;
`jax.config.update` still works because the backend initializes lazily.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
