"""Fused token-CE head kernel: logits never touch HBM.

The vocab head is the train step's hidden HBM hog. The composed path
(TokenHead.fused_ce 'xla' impl) chunks the time axis, but each chunk's
(B, C, V) f32 logits still materialize in HBM between the matmul and the
logsumexp/gather/argmax consumers — measured 7.9 ms fwd / 13.0 ms
fwd+bwd at B=512/T=96/V=10004 on v5e (tools/profile_kernels.py), ~5x the
252 GF matmul bound, because ~2 GB of f32 logits round-trip HBM per
pass.

Here one pallas call computes, per row tile, the logits tile IN VMEM and
reduces it on the spot to the three (M, 1) row statistics the loss needs
— target log-likelihood, argmax-correct indicator, and logsumexp (saved
as the backward's softmax residual). The backward kernel recomputes its
logits tile from (x, W) and emits dx plus f32-accumulated dW/db across
row-tile grid cells (output revisiting, same pattern as the fused trunk
kernels). HBM traffic drops from ~6 GB to ~the operands: x (25 MB),
W (5 MB), dx/dW once.

Numerics: the bf16 MXU dot accumulates in f32 and the logits stay f32
end-to-end (bias add, logsumexp, argmax). The composed flax path rounds
the dot output and bias add to bf16 before re-widening — an extra lossy
round this kernel deliberately skips, so bf16 configs differ from the
composed CE by at most ~1 bf16 ulp per logit (the kernel is the MORE
accurate of the two; the intermediate round also isn't stable across
compilers — XLA's simplifier elides it inside fused regions). f32
configs match exactly. Values + x/W/b grads pinned by
tests/test_pallas_ce.py on the CPU interpret path.

Reference parity: the reference computes a plain softmax CE over the
dictionary head (SURVEY.md §3.2 output head); this kernel is the
TPU-native form of the same loss.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sketchformer_tpu.ops.pallas_encoder import NEG_INF, _use_interpret
from sketchformer_tpu.ops.pallas_encoder_train import _mm, _NN, _NT, _TN

# Row-tile sizes, swept on v5e at B=512/T=96/V=10004 (fwd 128/256/512/768
# -> 3.74/3.63/3.71/3.94 ms; fwd+bwd with RM_BWD 128/256/512 ->
# 8.54/8.34/7.89 ms). The bwd prefers big tiles: each cell re-runs the
# (RM, Vp) recompute AND revisits the resident (d, Vp) f32 dW
# accumulator, so fewer cells amortize both; ~67 MB scoped VMEM at 512.
RM_FWD = 256
RM_BWD = 512


def _pad_to(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _ce_fwd_kernel(x_ref, w_ref, b_ref, tgt_ref,
                   ll_ref, corr_ref, lse_ref, *, Vp):
    f32 = jnp.float32
    RM = x_ref.shape[0]
    # bf16 MXU dot with f32 accumulation, f32 bias: the logits stay f32
    # end-to-end. The composed flax path (nn.Dense(dtype=bf16)) rounds
    # the dot output and the bias add to bf16 before re-widening; this
    # kernel skips that lossy round (strictly more accurate), so bf16
    # configs may differ from the composed CE by <= 1 bf16 ulp per logit
    # (tests/test_pallas_ce.py pins the bound). f32 configs are exact.
    l = _mm(x_ref[:], w_ref[:], _NN) + b_ref[:]       # (RM, Vp) f32
    lane = jax.lax.broadcasted_iota(jnp.int32, (RM, Vp), 1)
    tgt = tgt_ref[:]                                  # (RM, 1) int32
    mx = jnp.max(l, axis=1, keepdims=True)
    e = jnp.exp(l - mx)
    lse = mx + jnp.log(jnp.sum(e, axis=1, keepdims=True))
    lt = jnp.sum(jnp.where(lane == tgt, l, 0.0), axis=1, keepdims=True)
    ll_ref[:] = lt - lse
    # first-index argmax, == jnp.argmax on the f32 logits
    idx = jnp.min(jnp.where(l >= mx, lane, Vp), axis=1, keepdims=True)
    corr_ref[:] = (idx == tgt).astype(f32)
    lse_ref[:] = lse


def _ce_bwd_kernel(x_ref, w_ref, b_ref, tgt_ref, lse_ref, gll_ref,
                   dx_ref, dw_ref, db_ref, *, Vp, dt):
    f32 = jnp.float32
    RM = x_ref.shape[0]
    l = _mm(x_ref[:], w_ref[:], _NN) + b_ref[:]       # f32, as in fwd
    p = jnp.exp(l - lse_ref[:])                       # softmax via saved lse
    lane = jax.lax.broadcasted_iota(jnp.int32, (RM, Vp), 1)
    onehot = (lane == tgt_ref[:]).astype(f32)
    dl = (onehot - p) * gll_ref[:]                    # d(ll)/d(logits) * g
    dlp = dl.astype(dt)                               # match bf16 bwd dots
    dx_ref[:] = _mm(dlp, w_ref[:], _NT).astype(dx_ref.dtype)
    first = pl.program_id(0) == 0

    def acc(ref, val):
        @pl.when(first)
        def _():
            ref[:] = jnp.zeros_like(ref)
        ref[:] += val.astype(ref.dtype)

    acc(dw_ref, _mm(x_ref[:], dlp, _TN))
    acc(db_ref, jnp.sum(dl, axis=0, keepdims=True))


def _row_spec(RM, width):
    return pl.BlockSpec((RM, width), lambda g: (g, 0),
                        memory_space=pltpu.VMEM)


def _const_spec(shape):
    zeros = (0,) * len(shape)
    return pl.BlockSpec(shape, lambda g, _z=zeros: _z,
                        memory_space=pltpu.VMEM)


def _pad_operands(x, w, b, tgt, RM):
    """Pad rows to a multiple of RM and vocab to 128 lanes. Padded vocab
    lanes carry a NEG_INF bias (zero softmax mass, never the argmax);
    padded rows are sliced off by the wrapper (their gll is zero in bwd)."""
    M, d = x.shape
    V = w.shape[1]
    Vp = _pad_to(V, 128)
    Mp = _pad_to(M, RM)
    dt = x.dtype
    wp = jnp.pad(w.astype(dt), ((0, 0), (0, Vp - V)))
    bp = jnp.pad(b.astype(jnp.float32), (0, Vp - V),
                 constant_values=NEG_INF).reshape(1, Vp)
    xp = jnp.pad(x, ((0, Mp - M), (0, 0)))
    tp = jnp.pad(tgt.reshape(M, 1), ((0, Mp - M), (0, 0)))
    return xp, wp, bp, tp, Mp, Vp


def _rm(M, rm_default):
    return min(rm_default, _pad_to(M, 8))


def _ce_fwd_call(x, w, b, tgt):
    M, d = x.shape
    RM = _rm(M, RM_FWD)
    xp, wp, bp, tp, Mp, Vp = _pad_operands(x, w, b, tgt, RM)
    out_shape = tuple(jax.ShapeDtypeStruct((Mp, 1), jnp.float32)
                      for _ in range(3))
    ll, corr, lse = pl.pallas_call(
        functools.partial(_ce_fwd_kernel, Vp=Vp),
        grid=(Mp // RM,),
        in_specs=[_row_spec(RM, d), _const_spec(wp.shape),
                  _const_spec(bp.shape), _row_spec(RM, 1)],
        out_specs=tuple(_row_spec(RM, 1) for _ in range(3)),
        out_shape=out_shape,
        interpret=_use_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(xp, wp, bp, tp)
    return ll[:M, 0], corr[:M, 0], lse


def _ce_bwd_call(x, w, b, tgt, lse, gll):
    M, d = x.shape
    V = w.shape[1]
    RM = _rm(M, RM_BWD)
    xp, wp, bp, tp, Mp, Vp = _pad_operands(x, w, b, tgt, RM)
    gp = jnp.pad(gll.reshape(M, 1), ((0, Mp - M), (0, 0)))
    out_shape = (jax.ShapeDtypeStruct((Mp, d), x.dtype),
                 jax.ShapeDtypeStruct((d, Vp), jnp.float32),
                 jax.ShapeDtypeStruct((1, Vp), jnp.float32))
    dx, dw, db = pl.pallas_call(
        functools.partial(_ce_bwd_kernel, Vp=Vp, dt=x.dtype),
        grid=(Mp // RM,),
        in_specs=[_row_spec(RM, d), _const_spec(wp.shape),
                  _const_spec(bp.shape), _row_spec(RM, 1),
                  _row_spec(RM, 1), _row_spec(RM, 1)],
        out_specs=(_row_spec(RM, d), _const_spec((d, Vp)),
                   _const_spec((1, Vp))),
        out_shape=out_shape,
        interpret=_use_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xp, wp, bp, tp, lse, gp)
    return dx[:M], dw[:, :V].astype(w.dtype), db[0, :V].astype(b.dtype)


@jax.custom_vjp
def token_ce_rows(x, w, b, tgt):
    """Per-row token CE statistics without materializing logits in HBM.

    x: (M, d) trunk rows (compute dtype); w: (d, V) f32 head kernel;
    b: (V,) f32 head bias; tgt: (M,) int32 target ids.
    Returns (ll, corr): (M,) f32 target log-likelihood (log softmax at
    tgt) and (M,) f32 argmax==tgt indicator. ``corr`` is
    piecewise-constant — its cotangent is ignored. Masking/averaging is
    the caller's (differentiable XLA) job.
    """
    ll, corr, _ = _ce_fwd_call(x, w, b, tgt)
    return ll, corr


def _token_ce_fwd(x, w, b, tgt):
    ll, corr, lse = _ce_fwd_call(x, w, b, tgt)
    return (ll, corr), (x, w, b, tgt, lse)


def _token_ce_bwd(res, g):
    x, w, b, tgt, lse = res
    gll = g[0].astype(jnp.float32)    # g[1] (corr) is piecewise-constant
    dx, dw, db = _ce_bwd_call(x, w, b, tgt, lse, gll)
    return dx, dw, db, None


token_ce_rows.defvjp(_token_ce_fwd, _token_ce_bwd)
