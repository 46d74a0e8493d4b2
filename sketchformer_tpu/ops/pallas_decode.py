"""KV-cached decode attention Pallas kernel (batched greedy AR decode).

North-star component: "batched greedy decode runs through a KV-cached Pallas
attention kernel". The reference re-runs the whole decoder over the growing
prefix each AR step (no cache, O(T^2 L) attention per sketch); here each
step is one fused kernel per (batch*head) grid cell that reads the
static-shape KV cache once.

Design: decode attention at step t is BANDWIDTH-bound — the work is
streaming the (B*H, Tmax, D) cache through the VPU, not MXU math (q is a
single position). The kernel therefore:

- runs on a (B*H,) grid over caches ALREADY STORED head-folded as
  (B*H, Tmax, D) (see models/attention.py decode branch) so no per-step
  relayout of the cache is ever needed, and every block is a full (T, D)
  pane satisfying Mosaic's tiling rules;
- computes scores as a broadcast-multiply + lane reduction (VPU), masks
  positions >= cache_len via iota compare, takes an f32 softmax, and
  reduces P*V over sublanes — no (1, T) MXU matvec, which would waste the
  systolic array;
- gets ``cache_len`` as a scalar-prefetch argument so the same compiled
  kernel serves every decode step (static shapes, zero recompiles).

Interpret mode runs automatically off-TPU (CPU tests).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _rows_per_cell(BH: int, Tmax: int, D: int) -> int:
    """Cache rows per grid cell. Grid-cell count is the decode bottleneck
    (each cell costs ~1us of fixed overhead and a full AR decode issues
    layers x steps x cells of them), so pack as many rows per cell as the
    VMEM budget allows: ~2 MB of f32 K/V panes per cell keeps total usage
    (double-buffered bf16 inputs + in-kernel f32 copies + products) under
    the 16 MB scoped limit."""
    budget = 2 * 1024 * 1024
    per_row = 2 * Tmax * D * 4
    g = max(1, budget // max(per_row, 1))
    while g > 1 and BH % g:
        g -= 1
    return g


def _decode_kernel(len_ref, q_ref, k_ref, v_ref, o_ref):
    length = len_ref[0]
    q = q_ref[:].astype(jnp.float32)                # (G, 1, D)
    k = k_ref[:].astype(jnp.float32)                # (G, T, D)
    v = v_ref[:].astype(jnp.float32)                # (G, T, D)
    D = q.shape[-1]
    scale = 1.0 / (D ** 0.5)
    s = jnp.sum(k * q, axis=2) * scale              # (G, T) VPU lane-reduce
    t_ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(t_ids < length, s, NEG_INF)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=1, keepdims=True)       # (G, T)
    o = jnp.sum(p[:, :, None] * v, axis=1, keepdims=True)  # (G, 1, D)
    o_ref[:] = o.astype(o_ref.dtype)


def decode_attention(
    q: jnp.ndarray,          # (B*H, 1, D) current-position queries
    k_cache: jnp.ndarray,    # (B*H, Tmax, D) head-folded cache
    v_cache: jnp.ndarray,    # (B*H, Tmax, D)
    cache_len: jnp.ndarray,  # scalar int32: number of valid cache slots
) -> jnp.ndarray:
    BH, _, D = q.shape
    Tmax = k_cache.shape[1]
    G = _rows_per_cell(BH, Tmax, D)
    spec_q = pl.BlockSpec((G, 1, D), lambda g, *_: (g, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_k = pl.BlockSpec((G, Tmax, D), lambda g, *_: (g, 0, 0),
                          memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(BH // G,),
        in_specs=[spec_q, spec_k, spec_k],
        out_specs=spec_q,
    )
    return pl.pallas_call(
        _decode_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=_use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=4 * BH * Tmax * D,
            bytes_accessed=(k_cache.size + v_cache.size) * k_cache.dtype.itemsize,
            transcendentals=BH * Tmax,
        ),
    )(jnp.reshape(cache_len.astype(jnp.int32), (1,)), q, k_cache, v_cache)
