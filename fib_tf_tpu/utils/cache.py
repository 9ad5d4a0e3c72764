"""Persistent XLA/Mosaic compilation cache.

The fused Pallas kernels can take minutes to compile (Mosaic unrolls the
whole multi-substep body); the persistent cache makes that a one-time cost
per machine.  Disable with FIB_NO_COMPILE_CACHE=1.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
    ".jax_cache",
)

_enabled = False


def enable(cache_dir: str | None = None):
    global _enabled
    if _enabled or os.environ.get("FIB_NO_COMPILE_CACHE"):
        return
    import jax

    cache_dir = cache_dir or os.environ.get(
        "FIB_COMPILE_CACHE_DIR", _DEFAULT_DIR
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _enabled = True
