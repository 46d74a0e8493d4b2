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

# persistent executable cache: cuts repeat-suite wall-clock on the 1-CPU
# workers (CPU programs cache too; utils/compile_cache.py)
from sketchformer_tpu.utils.compile_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()
