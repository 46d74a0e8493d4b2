"""Persistent XLA compilation cache (slow-link resilience).

On this environment's remote-PJRT TPU link, first-compile latency is
worker-dependent: the same trivial matmul measured 27-89 s to compile on
one worker vs single-digit seconds on another (execution and cache-hit
cost are unchanged — a cached program loads in <1 s). bench.py compiles
dozens of programs, so a cold-cache run on a slow worker multiplies that
into tens of minutes of pure waiting.

:func:`enable_persistent_cache` turns on JAX's on-disk executable cache.
Verified working with the axon PJRT plugin: fresh-process matmul compile
27.1 s -> 0.8 s. Entry points that benefit (bench.py, __graft_entry__,
cli.py, tests/conftest.py) call it at startup; set
``SKETCHFORMER_NO_JAX_CACHE=1`` to opt out, or
``SKETCHFORMER_JAX_CACHE=/path`` to relocate the directory.

Why the directory is HOST-FINGERPRINTED: XLA:CPU ahead-of-time entries
embed the compiling machine's CPU feature set, and loading them on a
worker with a narrower feature set is a potential SIGILL
(``cpu_aot_loader.cc`` "Machine type used for XLA:CPU compilation
doesn't match the machine type for execution"). Round 3 shared a fixed
``/tmp`` path across heterogeneous workers and the round-3 multichip
dryrun tail filled with exactly that warning. The cache dir now embeds a
hash of (machine arch, CPU flags, jax/jaxlib versions), so a
differently-featured worker gets a disjoint cache instead of someone
else's AOT code. The fingerprint also makes the path per-user-safe in
practice, and we additionally key by uid so two users on one machine
never contend on directory ownership.

Why the cache is OFF for the CPU backend by default: even same-machine
reloads of XLA:CPU AOT entries log the machine-mismatch error, because
XLA compiles with LLVM *tuning* pseudo-features (+prefer-no-scatter,
+prefer-no-gather) that the load-time host probe never reports
(measured here: a fresh fingerprinted dir still warned on its own
entries). The measured CPU-side benefit is marginal (0.28 s -> 0.13 s
for a small program) while the slow-worker pain the cache exists for is
the remote TPU compile link (27-89 s). So when jax has been retargeted
to cpu-only (tests, multichip dryrun), :func:`enable_persistent_cache`
stands down unless ``allow_cpu=True``.
"""

from __future__ import annotations

import hashlib
import os
import platform
import tempfile
import warnings


def _cpu_feature_fingerprint() -> str:
    """Hash of everything that decides whether an XLA:CPU AOT executable
    compiled here can run there: arch, CPU feature flags, jax versions."""
    parts = [platform.machine(), platform.system()]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    # one representative core is enough; flags are per-package
                    parts.append(" ".join(sorted(line.split(":", 1)[1].split())))
                    break
    except OSError:
        pass
    try:
        import jax
        import jaxlib

        parts.append(jax.__version__)
        parts.append(jaxlib.__version__)
    except ImportError:
        pass
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:12]


def default_cache_dir() -> str:
    """Per-user, per-host-fingerprint cache directory."""
    try:
        uid = os.getuid()
    except AttributeError:  # non-POSIX
        uid = 0
    return os.path.join(
        tempfile.gettempdir(),
        f"sketchformer_tpu_jaxcache_u{uid}_{_cpu_feature_fingerprint()}",
    )


def _cpu_only_platform() -> bool:
    """True when this process will run on the XLA:CPU backend — either
    explicitly retargeted (tests / multichip dryrun; judged WITHOUT
    initializing the backend) or, with JAX_PLATFORMS unset, because no
    accelerator resolves and the default backend falls back to cpu
    (ADVICE r4: a TPU-less host must stand down the same way)."""
    try:
        import jax

        plats = jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS", "")
    except ImportError:
        return False
    names = {p.strip() for p in plats.split(",") if p.strip()}
    if names:
        return names == {"cpu"}
    # No explicit retarget: resolve the default backend. This initializes
    # it — acceptable for our callers (bench/CLI/entry), which touch the
    # backend immediately afterwards anyway; the cache config itself is
    # consulted at compile time, so setting it post-init is fine.
    try:
        return jax.default_backend() == "cpu"
    except RuntimeError:
        return True  # no backend at all: nothing worth caching


def _backfill_atime_sidecars(cache_dir: str) -> None:
    """Entries written before eviction was enabled have no ``-atime``
    sidecar; jax's LRU sweep (``jax/_src/lru_cache.py``) reads every
    entry's sidecar on each put and a single missing one makes ALL
    subsequent cache writes fail with a FileNotFoundError warning
    (observed: a round-4 dir broke every round-5 write). Backfill any
    missing sidecars, stamped now — eviction order among legacy entries
    is arbitrary but every future put works."""
    import time

    stamp = time.time_ns().to_bytes(8, "little")
    try:
        for name in os.listdir(cache_dir):
            if not name.endswith("-cache"):
                continue
            atime = os.path.join(cache_dir, name[: -len("-cache")] + "-atime")
            if not os.path.exists(atime):
                with open(atime, "wb") as f:
                    f.write(stamp)
    except OSError:
        pass  # unreadable dir: the put-path warning will surface it


def enable_persistent_cache(
    path: str | None = None, allow_cpu: bool = False
) -> str | None:
    """Point JAX at an on-disk compilation cache; returns the dir (or
    None when disabled). Safe to call multiple times / before backend
    init; never raises (a cache failure must not take down the caller),
    but unexpected failures emit a warning instead of vanishing.
    """
    if os.environ.get("SKETCHFORMER_NO_JAX_CACHE") == "1":
        return None
    try:
        import jax
    except ImportError:
        return None
    if not allow_cpu and _cpu_only_platform():
        return None
    cache_dir = (path or os.environ.get("SKETCHFORMER_JAX_CACHE")
                 or default_cache_dir())
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache everything: on the slow workers even sub-second host
        # compiles add up across bench's dozens of programs
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        # bound the directory (LRU eviction): one worker's dir measured
        # 4.5 GB unbounded across rounds (VERDICT r4 item 7)
        jax.config.update("jax_compilation_cache_max_size", 2 * 1024**3)
        _backfill_atime_sidecars(cache_dir)
    except (OSError, AttributeError, ValueError, KeyError) as e:
        # OSError: unwritable dir; the rest: config-name drift across jax
        # versions. Warn so a typo/regression is visible, then stand down.
        warnings.warn(
            f"persistent compile cache disabled ({type(e).__name__}: {e})",
            stacklevel=2,
        )
        return None
    return cache_dir
