"""Fused attention Pallas kernel for training (forward + custom-VJP backward).

North-star component: "Pallas-fused transformer" — the reference has no
custom kernels (pure TF2 ops); this is the TPU-native hot path.

Design rationale (sketch workloads, SURVEY.md §5): QuickDraw sequences are
short (buckets 32..256). At T<=1024 and head_dim<=128 the ENTIRE per-(batch,
head) attention problem — q, k, v and the (Tq, Tk) score matrix — fits in
VMEM, so the speed-of-light kernel is a single fused pass per (batch*head)
grid cell: one MXU matmul for scores, an in-register f32 softmax, one MXU
matmul for the output, with no HBM round-trip for the score matrix and no
online-softmax bookkeeping (which only pays when a row doesn't fit VMEM).
The backward kernel recomputes the softmax (flash-style: nothing quadratic
is saved) and emits dq, dk, dv in one fused pass.

Layout: Mosaic requires the last two block dims to tile (8, 128) or equal
the array dims, so the wrapper folds heads into batch — (B, T, H, D) ->
(B*H, T, D) — making every block a full (T, D) pane. The transposes are
cheap relayouts XLA fuses into neighboring ops.

For sequences beyond ``MAX_FUSED_LEN`` the wrapper falls back to the XLA
formulation (cross-chip ring/context-parallelism would be pure overhead at
sketch lengths — documented decision).

Masking: callers pass a boolean mask broadcastable against (B, H, Tq, Tk)
(True = attend). It is converted once to an additive f32 bias of shape
(B or 1, Tq, Tk) shared across heads — sketch models never need per-head
masks, and sharing keeps the bias HBM footprint negligible.

Interpret mode runs automatically off-TPU so the same code path is test-
covered on CPU (SURVEY.md §4 item 5).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9
MAX_FUSED_LEN = 1024
# Per-grid-cell VMEM budgets (bytes) for grouping batch elements. Tunable
# module-level so the bench/tuning harness can sweep them; defaults chosen
# by measurement on v5e (see tools/tune_attention.py).
FWD_VMEM_BUDGET = 2 * 1024 * 1024
BWD_VMEM_BUDGET = 1024 * 1024


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _bias_from_mask(
    mask: Optional[jnp.ndarray], Tq: int, Tk: int
) -> jnp.ndarray:
    """Boolean mask (broadcastable to (B, H, Tq, Tk), head-invariant) ->
    additive f32 bias (B or 1, Tq, Tk)."""
    if mask is None:
        return jnp.zeros((1, Tq, Tk), jnp.float32)
    if mask.ndim != 4:
        raise ValueError("mask must be 4D (B, H, Tq, Tk)-broadcastable")
    mask = mask[:, 0]  # head-invariant
    mask = jnp.broadcast_to(mask, (mask.shape[0], Tq, Tk))
    return jnp.where(mask, 0.0, NEG_INF).astype(jnp.float32)


def _fold_heads(x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, H, D) -> (B*H, T, D)."""
    B, T, H, D = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B * H, T, D)


def _unfold_heads(x: jnp.ndarray, B: int, H: int) -> jnp.ndarray:
    BH, T, D = x.shape
    return x.reshape(B, H, T, D).transpose(0, 2, 1, 3)


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------


def _batches_per_cell(
    B: int, Tq: int, Tk: int, D: int, H: int,
    budget: Optional[int] = None,
) -> int:
    """Group whole batch elements (H heads each) per grid cell so the grid
    is small enough that per-cell overhead amortizes, while q/k/v/S panes
    stay a few MB of VMEM (the backward kernel holds ~2x the panes of the
    forward, so it passes a halved budget)."""
    if budget is None:
        budget = FWD_VMEM_BUDGET
    per_batch = H * (Tq + 2 * Tk) * D * 4 + Tq * Tk * 4
    nb = max(1, budget // max(per_batch, 1))
    while nb > 1 and B % nb:
        nb -= 1
    return nb


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale, H, bias_b):
    # One BATCHED dot over all NB*H rows in the cell (a hardware-looped
    # Mosaic batch-matmul) — a per-head fori_loop costs ~0.5us/iteration of
    # loop overhead, which at (B*H)/cell iterations dominated the kernel.
    G = q_ref.shape[0]
    s = jax.lax.dot_general(
        q_ref[:], k_ref[:], (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale                                          # (G, Tq, Tk) f32
    if bias_b > 1:
        NB = G // H
        Tq, Tk = s.shape[1], s.shape[2]
        s = (s.reshape(NB, H, Tq, Tk) + bias_ref[:][:, None]).reshape(
            G, Tq, Tk)
    else:
        s = s + bias_ref[0][None]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v_ref.dtype)
    o = jax.lax.dot_general(
        p, v_ref[:], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = o.astype(o_ref.dtype)


def _specs(Tq, Tk, D, H, NB, bias_b):
    spec_q = pl.BlockSpec((NB * H, Tq, D), lambda g: (g, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_k = pl.BlockSpec((NB * H, Tk, D), lambda g: (g, 0, 0),
                          memory_space=pltpu.VMEM)
    if bias_b > 1:
        spec_bias = pl.BlockSpec((NB, Tq, Tk), lambda g: (g, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        spec_bias = pl.BlockSpec((1, Tq, Tk), lambda g: (0, 0, 0),
                                 memory_space=pltpu.VMEM)
    return spec_q, spec_k, spec_bias


def _fwd(q, k, v, bias, H):
    BH, Tq, D = q.shape
    Tk = k.shape[1]
    B = BH // H
    NB = _batches_per_cell(B, Tq, Tk, D, H)
    scale = 1.0 / (D ** 0.5)
    spec_q, spec_k, spec_bias = _specs(Tq, Tk, D, H, NB, bias.shape[0])
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, H=H, bias_b=bias.shape[0]),
        grid=(B // NB,),
        in_specs=[spec_q, spec_k, spec_k, spec_bias],
        out_specs=spec_q,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=_use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * BH * Tq * Tk * D,
            bytes_accessed=(q.size + 2 * k.size) * q.dtype.itemsize,
            transcendentals=BH * Tq * Tk,
        ),
    )(q, k, v, bias)


# ---------------------------------------------------------------------------
# backward kernel (recompute softmax; emit dq, dk, dv fused)
# ---------------------------------------------------------------------------


def _bwd_kernel(q_ref, k_ref, v_ref, bias_ref, g_ref,
                dq_ref, dk_ref, dv_ref, *, scale, H, bias_b):
    G = q_ref.shape[0]
    q = q_ref[:]
    k = k_ref[:]
    v = v_ref[:]
    g = g_ref[:]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale                                              # (G, Tq, Tk)
    if bias_b > 1:
        NB = G // H
        Tq, Tk = s.shape[1], s.shape[2]
        s = (s.reshape(NB, H, Tq, Tk) + bias_ref[:][:, None]).reshape(
            G, Tq, Tk)
    else:
        s = s + bias_ref[0][None]
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)              # (G, Tq, Tk) f32
    p_lp = p.astype(v.dtype)
    dv = jax.lax.dot_general(                                # p^T @ g
        p_lp, g, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                  # (G, Tk, D)
    dp = jax.lax.dot_general(                                # g @ v^T
        g, v, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                  # (G, Tq, Tk)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    ds_lp = ds.astype(q.dtype)
    dq = jax.lax.dot_general(
        ds_lp, k, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale          # (G, Tq, D)
    dk = jax.lax.dot_general(                                # ds^T @ q
        ds_lp, q, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale          # (G, Tk, D)
    dq_ref[:] = dq.astype(dq_ref.dtype)
    dk_ref[:] = dk.astype(dk_ref.dtype)
    dv_ref[:] = dv.astype(dv_ref.dtype)


def _bwd_call(q, k, v, bias, g, H):
    BH, Tq, D = q.shape
    Tk = k.shape[1]
    B = BH // H
    NB = _batches_per_cell(B, Tq, Tk, D, H, budget=BWD_VMEM_BUDGET)
    scale = 1.0 / (D ** 0.5)
    spec_q, spec_k, spec_bias = _specs(Tq, Tk, D, H, NB, bias.shape[0])
    return pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, H=H, bias_b=bias.shape[0]),
        grid=(B // NB,),
        in_specs=[spec_q, spec_k, spec_k, spec_bias, spec_q],
        out_specs=(spec_q, spec_k, spec_k),
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
        interpret=_use_interpret(),
    )(q, k, v, bias, g)


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _attention(q, k, v, bias, H):
    return _fwd(q, k, v, bias, H)


def _attention_fwd(q, k, v, bias, H):
    return _fwd(q, k, v, bias, H), (q, k, v, bias)


def _attention_bwd(H, res, g):
    q, k, v, bias = res
    dq, dk, dv = _bwd_call(q, k, v, bias, g, H)
    return dq, dk, dv, None


_attention.defvjp(_attention_fwd, _attention_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    head_major: bool = False,
) -> jnp.ndarray:
    """Fused attention; boolean mask, True=attend.

    ``head_major=False``: (B, T, H, D) tensors — folded with explicit
    transposes (compat path). ``head_major=True``: (B, H, T, D) tensors as
    produced by HeadProjection — folding is a FREE contiguous reshape, which
    is the production layout (the transposes otherwise cost more HBM traffic
    than the fusion saves).

    Falls back to the XLA path for sequences too long for the fused-VMEM
    strategy (not a sketch workload).
    """
    if head_major:
        B, H, Tq, D = q.shape
        Tk = k.shape[2]
    else:
        B, Tq, H, D = q.shape
        Tk = k.shape[1]
    if max(Tq, Tk) > MAX_FUSED_LEN:
        from sketchformer_tpu.models.attention import dot_product_attention

        if head_major:
            to_btHD = lambda x: x.transpose(0, 2, 1, 3)
            out = dot_product_attention(
                to_btHD(q), to_btHD(k), to_btHD(v), mask=mask, impl="xla")
            return out.transpose(0, 2, 1, 3)
        return dot_product_attention(q, k, v, mask=mask, impl="xla")
    bias = _bias_from_mask(mask, Tq, Tk)
    if head_major:
        fold = lambda x: x.reshape(B * H, x.shape[2], D)
        out = _attention(fold(q), fold(k), fold(v), bias, H)
        return out.reshape(B, H, Tq, D)
    out = _attention(_fold_heads(q), _fold_heads(k), _fold_heads(v), bias, H)
    return _unfold_heads(out, B, H)
