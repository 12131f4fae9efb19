"""Persistent XLA compilation cache.

TPU compiles of the Pallas kernels take minutes on this toolchain;
caching them on disk makes every process after the first start fast.
Call ``enable()`` before the first jit execution (renderer and bench do).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/wavefront_pt_jax")
_enabled = False


def enable(cache_dir: str | None = None) -> None:
    global _enabled
    if _enabled:
        return
    import jax

    path = cache_dir or os.environ.get("WPT_COMPILE_CACHE", _DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _enabled = True
    except Exception:
        pass
