"""Test configuration: run everything on a simulated 8-device CPU backend.

Mirrors SURVEY.md §4 item 4: `--xla_force_host_platform_device_count=8`
is the standard JAX substitute for a fake multi-device backend, letting the
mesh/pjit tests validate sharding without TPU hardware.

Note: this environment's sitecustomize imports jax at interpreter start with
JAX_PLATFORMS=axon baked in, so plain env vars are too late here —
``jax.config.update`` is required to retarget the platform before the first
backend initialization.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent executable cache: a no-op here since round 4 — the platform
# above is cpu-only and utils/compile_cache.py stands down for the CPU
# backend (same-machine XLA:CPU AOT reloads log machine-mismatch SIGILL
# warnings; see that module's docstring). Kept so a TPU-targeted test
# invocation still benefits.
from sketchformer_tpu.utils.compile_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()
