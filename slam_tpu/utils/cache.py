"""Persistent XLA compilation cache.

Compiles on the axon remote-compile TPU toolchain cost minutes for the
larger solver programs (the partitioned Schur LM in particular); JAX's
persistent compilation cache amortises that across processes.  Entry points
(CLI, bench) call :func:`enable_persistent_cache` before building programs.
"""

from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get(
        "SLAM_TPU_CACHE", os.path.expanduser("~/.cache/slam_tpu_xla")
    )
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax or unsupported backend: cache is best-effort
