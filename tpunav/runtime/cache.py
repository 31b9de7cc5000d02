"""Persistent XLA compilation cache.

TPU compiles in this environment go through a remote AOT helper and can
take minutes for control-flow-heavy programs (the EKF measurement scan,
the fused Pallas solve). The persistent cache keys serialized executables
by HLO hash, so every process after the first loads in milliseconds.
Demos, bench, and the driver entry all call :func:`enable` first.
"""

from __future__ import annotations

import os

import jax

_DEFAULT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")

_enabled = False


def enable(path: str | None = None) -> str:
    """Idempotently enable the persistent compilation cache."""
    global _enabled
    cache_dir = path or os.environ.get("TPUNAV_JAX_CACHE", _DEFAULT)
    if not _enabled:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        # Size gating must be disabled explicitly or nothing is written
        # on this platform.
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        _enabled = True
    return cache_dir
