"""Persistent XLA compilation cache.

The flagship train step takes tens of seconds to compile (70+ s over the
tunneled TPU relay); every fresh process paid it again.  The reference has
no equivalent concern (torch eager), so this is pure TPU-framework plumbing:
opt every entry point (fit, the CLIs, bench) into JAX's persistent
compilation cache so only the first process ever compiles a given program.

Env overrides win: set JAX_COMPILATION_CACHE_DIR yourself to relocate (or
JAX_COMPILATION_CACHE_DIR="" to disable).
"""
from __future__ import annotations

import os

_DEFAULT_DIR = "/tmp/ramdsir_jax_cache"
_done = False


def enable_persistent_cache(cache_dir: str | None = None) -> None:
    """Idempotent; safe to call before or after jax backend init."""
    global _done
    if _done:
        return
    _done = True
    if "JAX_COMPILATION_CACHE_DIR" in os.environ:
        # user controls it (empty string = explicitly disabled)
        if not os.environ["JAX_COMPILATION_CACHE_DIR"]:
            return
        cache_dir = os.environ["JAX_COMPILATION_CACHE_DIR"]
    cache_dir = cache_dir or _DEFAULT_DIR
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache everything that takes non-trivial compile time (relay-tunneled
    # chips compile even one-op programs in ~0.5-2 s)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
