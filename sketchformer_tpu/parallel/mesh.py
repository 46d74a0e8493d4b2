"""Device mesh construction and multi-host initialization.

The reference is single-process TF2 with at most single-host GPU selection
(reference: train.py --gpu flag); there is no distribution layer to port.
This module is the TPU-native parallel substrate the north star mandates:

- one ``jax.sharding.Mesh`` over all chips with axes ``('data', 'model')``;
  batch shards over ``data`` (pure DP), weight matrices optionally shard
  over ``model`` (TP) via the rules in :mod:`sketchformer_tpu.parallel.sharding`;
- gradients are all-reduced by XLA-inserted collectives over ICI within a
  slice; multi-slice/multi-host runs call :func:`initialize_distributed`
  (DCN handled by PJRT) before building the mesh;
- pipeline/expert parallelism are deliberately NOT built: the model is
  ~10-30M params and fits on one chip with room to spare — PP/EP would be
  pure overhead (SURVEY.md §2 records the decision).

Mesh layout note: ``model`` is the fastest-varying (innermost) axis so the
latency-sensitive TP collectives ride contiguous ICI neighbors; DP gradient
all-reduces (bandwidth-bound, overlappable) span the outer axis.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host init (no-op when single-process / already initialized).

    Order matters: ``jax.distributed.initialize`` must run BEFORE the first
    backend initialization, and ``jax.process_count()`` itself initializes
    the backend — so the already-initialized guard must NOT probe the
    process count (the round-3 version did; first executed by the
    2-process harness in parallel/multiprocess.py, which caught it)."""
    if coordinator_address is None:
        return  # single-host
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        if "already" in str(e).lower():
            return  # idempotent: a second call is a no-op
        raise


def make_mesh(
    model_parallelism: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """('data', 'model') mesh over all devices; data = n // model."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % model_parallelism:
        raise ValueError(
            f"{n} devices not divisible by model_parallelism={model_parallelism}"
        )
    grid = np.asarray(devices).reshape(n // model_parallelism, model_parallelism)
    return Mesh(grid, axis_names=("data", "model"))
