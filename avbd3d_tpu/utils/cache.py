"""Persistent XLA compilation cache setup.

First compilation of the step function takes tens of seconds; caching
compiled executables on disk makes subsequent processes start instantly.
Safe to call multiple times.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/avbd3d_tpu_xla")


def enable_compilation_cache(path: str | None = None) -> None:
    # Unify the CPU-platform flag across every entry point (CLI, bench,
    # tests, probes) BEFORE backend init: XLA_FLAGS participates in the
    # cache key, so a CLI without the suite's 8-virtual-device flag would
    # compile its own parallel universe of entries.  On this box a cold
    # XLA:CPU step compile costs tens of minutes (PERF_NOTES.md round-3
    # findings) — one shared namespace matters.  The flag only shapes the
    # CPU platform; TPU runs are unaffected.
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax

    cache_dir = path or os.environ.get("AVBD3D_CACHE_DIR", _DEFAULT_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # noqa: BLE001 - older jax without these flags
        pass
