"""Persistent XLA compilation cache (slow-link resilience).

On this environment's remote-PJRT TPU link, first-compile latency is
worker-dependent: the same trivial matmul measured 27-89 s to compile on
one worker vs single-digit seconds on another (execution and cache-hit
cost are unchanged — a cached program loads in <1 s). bench.py compiles
dozens of programs, so a cold-cache run on a slow worker multiplies that
into tens of minutes of pure waiting.

:func:`enable_persistent_cache` turns on JAX's on-disk executable cache
(keyed by HLO hash + backend, so CPU test programs and TPU bench
programs coexist). Verified working with the axon PJRT plugin this
session: fresh-process matmul compile 27.1 s -> 0.8 s. Entry points that
benefit (bench.py, __graft_entry__, cli.py, tests/conftest.py) call it
at startup; set ``SKETCHFORMER_NO_JAX_CACHE=1`` to opt out, or
``SKETCHFORMER_JAX_CACHE=/path`` to relocate the directory.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = "/tmp/sketchformer_tpu_jaxcache"


def enable_persistent_cache(path: str | None = None) -> str | None:
    """Point JAX at an on-disk compilation cache; returns the dir (or
    None when disabled). Safe to call multiple times / before backend
    init; never raises (a cache failure must not take down the caller).
    """
    if os.environ.get("SKETCHFORMER_NO_JAX_CACHE") == "1":
        return None
    cache_dir = (path or os.environ.get("SKETCHFORMER_JAX_CACHE")
                 or _DEFAULT_DIR)
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache everything: on the slow workers even sub-second host
        # compiles add up across bench's dozens of programs
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        return None
    return cache_dir
