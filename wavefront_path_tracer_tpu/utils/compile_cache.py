"""Persistent XLA compilation cache.

TPU compiles of the Pallas kernels take minutes on this toolchain;
caching them on disk makes every process after the first start fast.
Call ``enable()`` before the first jit execution (renderer and bench do).
"""

from __future__ import annotations

import hashlib
import os
import platform

_DEFAULT_DIR = os.path.expanduser("~/.cache/wavefront_pt_jax")
_enabled = False


def _host_fingerprint() -> str:
    """Hash of this host's CPU feature set.

    XLA:CPU cache entries are AOT machine code specialized to the
    compiling host's CPU features; loading one on a host with a
    different feature set SIGSEGVs/SIGILLs (observed: entries from an
    AMX-capable host crashing `get_executable_and_time` on a non-AMX
    host).  JAX's cache key does not include the host CPU, so we
    namespace the cache directory by a fingerprint instead — same
    host: warm cache; different host: clean slate.
    """
    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    blob = f"{platform.machine()}|{flags}"
    return hashlib.md5(blob.encode()).hexdigest()[:10]


def enable(cache_dir: str | None = None) -> None:
    global _enabled
    if _enabled:
        return
    import jax

    path = cache_dir or os.environ.get("WPT_COMPILE_CACHE", _DEFAULT_DIR)
    path = os.path.join(path, _host_fingerprint())
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _enabled = True
    except Exception:
        pass
