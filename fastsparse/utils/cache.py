"""Persistent XLA compilation cache setup.

TPU compiles in this library are dominated by `lax.sort` and per-bucket
Pallas programs (one per bucket shape — BASELINE.json:5). The shapes are
stable across runs on the same matrix family, so a persistent cache turns
minutes of first-run compilation into milliseconds on every later run.
Call `enable_persistent_cache()` once at program start (bench/verify
scripts do); it is a no-op if the user already configured a cache.
"""
from __future__ import annotations

import os

import jax

__all__ = ["enable_persistent_cache"]

_DEFAULT_DIR = os.path.expanduser("~/.cache/fastsparse_xla")


def enable_persistent_cache(path: str | None = None) -> str:
    """Point JAX's persistent compilation cache at ``path`` (idempotent)."""
    current = jax.config.jax_compilation_cache_dir
    if current:
        return current
    path = path or os.environ.get("FASTSPARSE_CACHE_DIR", _DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return path
