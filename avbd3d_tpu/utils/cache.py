"""Persistent XLA compilation cache setup.

First compilation of the step function takes tens of seconds; caching
compiled executables on disk makes subsequent processes start instantly.
Safe to call multiple times.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/avbd3d_tpu_xla")


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    cache_dir = path or os.environ.get("AVBD3D_CACHE_DIR", _DEFAULT_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # noqa: BLE001 - older jax without these flags
        pass
