"""Fused attention Pallas kernel for training (forward + custom-VJP backward).

North-star component: "Pallas-fused transformer" — the reference has no
custom kernels (pure TF2 ops); this is the TPU-native hot path.

Design rationale (sketch workloads, SURVEY.md §5): QuickDraw sequences are
short (buckets 32..256). At T<=1024 and head_dim<=128 the ENTIRE per-batch
attention problem — q, k, v and the (H, Tq, Tk) score block — fits in VMEM,
so the speed-of-light kernel is a single fused pass per grid cell: one
batched MXU matmul for scores, an in-register f32 softmax, one MXU matmul
for the output, with no HBM round-trip for the score matrix and no
online-softmax bookkeeping (which only pays when a row doesn't fit VMEM).
The backward kernel recomputes the softmax (flash-style: nothing quadratic
is saved) and emits dq, dk, dv in one fused pass.

v2 design (round-2 perf findings, tools/tune_attention.py):
- Operands stay 4-D (B, H, T, D) at the HBM boundary: the round-1 kernel
  reshaped to (B*H, T, D) host-side, which forced XLA to insert 100-200 MB
  relayout copies in front of every custom call (seen in the OOM allocation
  dump). The head merge now happens INSIDE the kernel as a free leading-dim
  reshape of the VMEM pane (Mosaic matmuls allow only one batch dim).
- STRUCTURED masks instead of a materialized bias: the round-1 kernel took
  an additive (B, Tq, Tk) f32 bias — 302 MB of HBM per layer at
  B=2048/T=192. Callers now pass ``key_mask`` (B, Tk) and/or ``causal``;
  the causal triangle is a free in-kernel iota and the key mask is a
  (B, Tk) vector, eliminating the quadratic mask tensor entirely. (The
  legacy 4-D ``mask`` argument is still accepted: pure key masks are
  detected and demoted to the vector form; anything else falls back to a
  full per-batch (Tq, Tk) bias pane.)
- Softmax normalization is folded into the OUTPUT: o = (e @ v) / rowsum(e)
  scales the (Tq, D) output instead of dividing the (Tq, Tk) probability
  matrix — one fewer full quadratic VPU pass.

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
# by measurement on v5e (tools/tune_attention.py, kernel v2: fwd 8MB beat
# 2MB by ~3% at T=96 / T=192; bwd 4MB beat 1MB by ~2%).
FWD_VMEM_BUDGET = 8 * 1024 * 1024
BWD_VMEM_BUDGET = 4 * 1024 * 1024

# mask modes
_M_NONE, _M_KEY, _M_FULL = 0, 1, 2


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _batches_per_cell(
    B: int, Tq: int, Tk: int, D: int, H: int, budget: int, itemsize: int,
    n_score_panes: int = 2,
) -> int:
    """Group whole batch elements (H heads each) per grid cell so the grid
    is small enough that per-cell overhead amortizes, while q/k/v/o panes
    (input dtype) + f32 score panes stay within the VMEM budget.

    Accounting is LANE-PADDING-AWARE: Mosaic rounds the minor dim of every
    VMEM pane to 128 lanes, so a Dh=32 head pane costs 4x its logical
    size and a T=96 score pane costs 4/3. Round-4 code estimated logical
    sizes; at (B=1024, H=8, Dh=32) the resulting NB=8 cell compiled to a
    16.55 MB scoped allocation against Mosaic's 16 MB stack limit
    (double-buffered input panes) and the whole program failed to build."""
    d_p = ((D + 127) // 128) * 128
    tk_p = ((Tk + 127) // 128) * 128
    per_batch = (
        H * 2 * (Tq + Tk) * d_p * itemsize        # q+o, k+v panes
        + n_score_panes * H * Tq * tk_p * 4       # s, e in f32
    )
    nb = max(1, budget // max(per_batch, 1))
    while nb > 1 and B % nb:
        nb -= 1
    return nb


def _apply_mask(s, bias_ref, *, NB, H, mask_mode, causal, bias_b):
    """s (NB*H, Tq, Tk) f32 += structured mask terms.

    Mosaic matmuls allow at most ONE batch dim, so the kernel works on
    head-merged (NB*H, ...) panes; the per-batch bias is applied through a
    free leading-dim reshape to the (NB, H, ...) view.
    """
    G, Tq, Tk = s.shape
    if mask_mode == _M_KEY:
        # bias pane is (NB, 1, Tk): the singleton keeps the trailing block
        # dims equal to the array dims for ANY NB (Mosaic tiling rule)
        s = (s.reshape(NB, H, Tq, Tk)
             + bias_ref[:][:, None, :, :]).reshape(G, Tq, Tk)
    elif mask_mode == _M_FULL:
        b = bias_ref[:]                                 # (NBb, Tq, Tk)
        if bias_b == 1:
            s = s + b[0][None]
        else:
            s = (s.reshape(NB, H, Tq, Tk) + b[:, None]).reshape(G, Tq, Tk)
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (Tq, Tk), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (Tq, Tk), 1)
        s = jnp.where((col <= row)[None], s, NEG_INF)
    return s


# single-batch-dim (G=NB*H, ...) contraction specs — Mosaic supports at
# most one batch dim in tpu.matmul
_QK_DIMS = (((2,), (2,)), ((0,), (0,)))   # q·k^T over D
_EV_DIMS = (((2,), (1,)), ((0,), (0,)))   # e·v over Tk
_PT_G_DIMS = (((1,), (1,)), ((0,), (0,)))  # e^T·g over Tq
_DS_K_DIMS = (((2,), (1,)), ((0,), (0,)))  # ds·k over Tk
_DS_Q_DIMS = (((1,), (1,)), ((0,), (0,)))  # ds^T·q over Tq


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *,
                scale, causal, mask_mode, bias_b):
    NB, H, Tq, D = q_ref.shape
    Tk = k_ref.shape[2]
    G = NB * H
    q = q_ref[:].reshape(G, Tq, D)                      # free: leading dims
    k = k_ref[:].reshape(G, Tk, D)
    v = v_ref[:].reshape(G, Tk, D)
    s = jax.lax.dot_general(
        q, k, _QK_DIMS, preferred_element_type=jnp.float32,
    ) * scale                                           # (G, Tq, Tk)
    s = _apply_mask(s, bias_ref, NB=NB, H=H, mask_mode=mask_mode,
                    causal=causal, bias_b=bias_b)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)          # (G, Tq, 1)
    o = jax.lax.dot_general(
        e.astype(v.dtype), v, _EV_DIMS,
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = (o / denom).astype(o_ref.dtype).reshape(NB, H, Tq, D)


def _specs(Tq, Tk, D, H, NB, mask_mode, bias_b):
    spec_q = pl.BlockSpec((NB, H, Tq, D), lambda g: (g, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_k = pl.BlockSpec((NB, H, Tk, D), lambda g: (g, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    if mask_mode == _M_KEY:
        spec_bias = pl.BlockSpec((NB, 1, Tk), lambda g: (g, 0, 0),
                                 memory_space=pltpu.VMEM)
    elif mask_mode == _M_FULL and bias_b > 1:
        spec_bias = pl.BlockSpec((NB, Tq, Tk), lambda g: (g, 0, 0),
                                 memory_space=pltpu.VMEM)
    elif mask_mode == _M_FULL:  # shared (1, Tq, Tk) pane
        spec_bias = pl.BlockSpec((1, Tq, Tk), lambda g: (0, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:  # dummy (1, 1) pane, never read
        spec_bias = pl.BlockSpec((1, 1), lambda g: (0, 0),
                                 memory_space=pltpu.VMEM)
    return spec_q, spec_k, spec_bias


def _fwd(q, k, v, bias, causal, mask_mode, H):
    B, _, Tq, D = q.shape
    Tk = k.shape[2]
    NB = _batches_per_cell(B, Tq, Tk, D, H, FWD_VMEM_BUDGET,
                           q.dtype.itemsize)
    scale = 1.0 / (D ** 0.5)
    bias_b = bias.shape[0]
    spec_q, spec_k, spec_bias = _specs(Tq, Tk, D, H, NB, mask_mode, bias_b)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, causal=causal,
                          mask_mode=mask_mode, bias_b=bias_b),
        grid=(B // NB,),
        in_specs=[spec_q, spec_k, spec_k, spec_bias],
        out_specs=spec_q,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=_use_interpret(),
        # headroom for Mosaic's double-buffered input panes: the budget
        # bounds one cell's live panes, the pipeline keeps ~2x in flight
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * H * Tq * Tk * D,
            bytes_accessed=(q.size + 2 * k.size) * q.dtype.itemsize,
            transcendentals=B * H * Tq * Tk,
        ),
    )(q, k, v, bias)


# ---------------------------------------------------------------------------
# backward kernel (recompute softmax; emit dq, dk, dv fused)
# ---------------------------------------------------------------------------


def _bwd_kernel(q_ref, k_ref, v_ref, bias_ref, g_ref,
                dq_ref, dk_ref, dv_ref, *,
                scale, causal, mask_mode, bias_b):
    NB, H, Tq, D = q_ref.shape
    Tk = k_ref.shape[2]
    G = NB * H
    q = q_ref[:].reshape(G, Tq, D)
    k = k_ref[:].reshape(G, Tk, D)
    v = v_ref[:].reshape(G, Tk, D)
    g = g_ref[:].reshape(G, Tq, D)
    s = jax.lax.dot_general(
        q, k, _QK_DIMS, preferred_element_type=jnp.float32) * scale
    s = _apply_mask(s, bias_ref, NB=NB, H=H, mask_mode=mask_mode,
                    causal=causal, bias_b=bias_b)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)                                   # (G, Tq, Tk)
    recip = 1.0 / jnp.sum(e, axis=-1, keepdims=True)     # (G, Tq, 1)
    p = e * recip
    p_lp = p.astype(v.dtype)
    dv = jax.lax.dot_general(
        p_lp, g, _PT_G_DIMS, preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(
        g, v, _QK_DIMS, preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    ds_lp = ds.astype(q.dtype)
    dq = jax.lax.dot_general(
        ds_lp, k, _DS_K_DIMS, preferred_element_type=jnp.float32) * scale
    dk = jax.lax.dot_general(
        ds_lp, q, _DS_Q_DIMS, preferred_element_type=jnp.float32) * scale
    dq_ref[:] = dq.astype(dq_ref.dtype).reshape(NB, H, Tq, D)
    dk_ref[:] = dk.astype(dk_ref.dtype).reshape(NB, H, Tk, D)
    dv_ref[:] = dv.astype(dv_ref.dtype).reshape(NB, H, Tk, D)


def _bwd_call(q, k, v, bias, g, causal, mask_mode, H):
    B, _, Tq, D = q.shape
    Tk = k.shape[2]
    NB = _batches_per_cell(B, Tq, Tk, D, H, BWD_VMEM_BUDGET,
                           q.dtype.itemsize, n_score_panes=4)
    scale = 1.0 / (D ** 0.5)
    bias_b = bias.shape[0]
    spec_q, spec_k, spec_bias = _specs(Tq, Tk, D, H, NB, mask_mode, bias_b)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, causal=causal,
                          mask_mode=mask_mode, bias_b=bias_b),
        grid=(B // NB,),
        in_specs=[spec_q, spec_k, spec_k, spec_bias, spec_q],
        out_specs=(spec_q, spec_k, spec_k),
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
        interpret=_use_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
    )(q, k, v, bias, g)


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _attention(q, k, v, bias, causal, mask_mode, H):
    return _fwd(q, k, v, bias, causal, mask_mode, H)


def _attention_fwd(q, k, v, bias, causal, mask_mode, H):
    return _fwd(q, k, v, bias, causal, mask_mode, H), (q, k, v, bias)


def _attention_bwd(causal, mask_mode, H, res, g):
    q, k, v, bias = res
    dq, dk, dv = _bwd_call(q, k, v, bias, g, causal, mask_mode, H)
    return dq, dk, dv, None


_attention.defvjp(_attention_fwd, _attention_bwd)


def _structure_mask(mask, key_mask, causal, Tq, Tk):
    """Resolve (mask | key_mask | causal) into (bias, causal, mask_mode).

    The bias array is what the kernel reads: (B, Tk) f32 for key masks, a
    (B or 1, Tq, Tk) f32 pane for irreducible 4-D masks, or a (1, 1) dummy.
    """
    if mask is not None:
        if key_mask is not None:
            raise ValueError("pass either mask or key_mask, not both")
        if mask.ndim != 4:
            raise ValueError("mask must be 4D (B, H, Tq, Tk)-broadcastable")
        mask = mask[:, 0]  # head-invariant
        if mask.shape[1] == 1:  # pure key mask (B, 1, Tk)
            key_mask = mask[:, 0]
            mask = None
        else:
            bias = jnp.where(
                jnp.broadcast_to(mask, (mask.shape[0], Tq, Tk)),
                0.0, NEG_INF).astype(jnp.float32)
            return bias, causal, _M_FULL
    if key_mask is not None:
        if key_mask.ndim != 2:
            raise ValueError("key_mask must be (B, Tk)")
        bias = jnp.where(key_mask, 0.0, NEG_INF).astype(
            jnp.float32)[:, None, :]                    # (B, 1, Tk)
        return bias, causal, _M_KEY
    return jnp.zeros((1, 1), jnp.float32), causal, _M_NONE


def _xla_fallback(q_bthd, k_bthd, v_bthd, mask, key_mask, causal):
    from sketchformer_tpu.models.attention import (
        causal_mask as make_causal,
        combine_masks,
        dot_product_attention,
    )

    Tq = q_bthd.shape[1]
    full = combine_masks(
        mask,
        None if key_mask is None else key_mask[:, None, None, :],
        make_causal(Tq) if causal else None)
    return dot_product_attention(q_bthd, k_bthd, v_bthd, mask=full,
                                 impl="xla")


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    head_major: bool = False,
    key_mask: Optional[jnp.ndarray] = None,
    causal: bool = False,
) -> jnp.ndarray:
    """Fused attention.

    Masking (True = attend): prefer the STRUCTURED form — ``key_mask``
    (B, Tk) boolean plus ``causal`` — which the kernel applies without any
    quadratic mask tensor. The legacy ``mask`` argument (boolean,
    broadcastable to (B, H, Tq, Tk), head-invariant) is auto-demoted to a
    key mask when possible, else lowered to a per-batch bias pane.

    ``head_major=False``: (B, T, H, D) tensors (compat path — transposed).
    ``head_major=True``: (B, H, T, D) as produced by HeadProjection; the
    kernel consumes this layout DIRECTLY (no reshape, no relayout copy).

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
        if head_major:
            to_bthd = lambda x: x.transpose(0, 2, 1, 3)
            out = _xla_fallback(to_bthd(q), to_bthd(k), to_bthd(v),
                                mask, key_mask, causal)
            return out.transpose(0, 2, 1, 3)
        return _xla_fallback(q, k, v, mask, key_mask, causal)
    bias, causal, mask_mode = _structure_mask(mask, key_mask, causal, Tq, Tk)
    if mask_mode == _M_KEY and bias.shape[0] != B:
        bias = jnp.broadcast_to(bias, (B, 1, Tk))
    if not head_major:
        q, k, v = (x.transpose(0, 2, 1, 3) for x in (q, k, v))
    out = _attention(q, k, v, bias, causal, mask_mode, H)
    if not head_major:
        return out.transpose(0, 2, 1, 3)
    return out
