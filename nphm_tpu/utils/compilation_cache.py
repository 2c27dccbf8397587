"""Persistent XLA compilation cache for CLI entry points.

First compiles through this environment's remote-compile helper cost
~2-40 s for XLA programs and 3-10 MINUTES per fresh Pallas/Mosaic kernel
variant; every new process used to re-pay them (bench legs, each protocol
phase, every fitting CLI run).  JAX's persistent compilation cache stores
the serialized executables on disk keyed by program + platform, so repeat
processes deserialize in milliseconds (measured through the relay: a
cached program loads in ~0.1 s).

Opt out with NPHM_JAX_CACHE=0; override the location with
NPHM_JAX_CACHE_DIR.  Trainers/CLIs call ``enable_persistent_cache()``
before their first jit; calling it multiple times is harmless.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/nphm_tpu_jax")
_enabled = False


def enable_persistent_cache(cache_dir: str | None = None) -> bool:
    """Turn on the JAX persistent compilation cache.  Returns True if the
    cache is active (idempotent; False when disabled via NPHM_JAX_CACHE=0
    or when the jax version lacks the config knobs)."""
    global _enabled
    if os.environ.get("NPHM_JAX_CACHE", "1") == "0":
        return False
    if _enabled:
        return True
    cache_dir = cache_dir or os.environ.get("NPHM_JAX_CACHE_DIR", _DEFAULT_DIR)
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache everything: the relay makes even small compiles expensive
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        return False
    _enabled = True
    return True
