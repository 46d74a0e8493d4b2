"""Fused encoder-stack TRAINING path: stack forward + per-layer backward.

Extends the inference megakernel (ops/pallas_encoder.py) to training. The
same HBM-residency argument applies to the backward pass: the composed
XLA backward round-trips every intermediate through HBM, while each layer
here is one fused kernel that RECOMPUTES its internals in VMEM from the
layer input (flash-style: nothing quadratic and no per-op intermediates
are ever materialized in HBM).

Structure:
- forward = the inference stack kernel with ``collect_inputs=True``: one
  pallas call produces the stack output AND the per-layer residual-stream
  inputs x_i (the only saved tensors, L x (B, T, d)).
- backward = L calls of ``_layer_bwd_kernel``, newest layer first. Each
  reads (x_i, g) once, recomputes LN/qkv/attention/FFN in VMEM, and emits
  dx plus all weight gradients for that layer. Weight grads accumulate
  across batch grid cells via output revisiting (constant-index output
  blocks are initialized at cell 0 and stay VMEM-resident across the
  sequential TPU grid).
- the final stack LayerNorm runs OUTSIDE the kernel in the train path
  (plain XLA, one cheap differentiable op) so the custom VJP covers
  exactly the L-layer loop.

Scope: pre-LN layers, optional qk-norm. Dropout (two sites per layer,
post-attn-projection and post-FFN, matching models/transformer.py) is
driven by an EXTERNAL (2L, B, T, d) u8 bits tensor drawn once in XLA and
consumed bit-for-bit by the fwd and bwd kernels — same u8-threshold
semantics as models/dropout.py, no in-kernel RNG.

Gradient parity with the flax composed path is pinned by
tests/test_pallas_encoder_train.py (f32, CPU interpret).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sketchformer_tpu.ops import pallas_dropout as pdrop
from sketchformer_tpu.ops import pallas_packed as pk
from sketchformer_tpu.ops.pallas_encoder import (
    LN_EPS,
    NEG_INF,
    _batches_per_cell,
    _stack_kernel,
    _use_interpret,
)

# f32 weight-gradient panes + recompute panes are heavier than inference:
# budget tuned on v5e so the flagship (d256/H2, B=512/T=96) lands on
# NB=16 (measured best; NB=8 +0.5ms/step, NB=2 was 1.5x SLOWER than
# composed — grid-cell matmuls too small). The estimate is lane-padding-
# aware, so small-head_dim configs self-select smaller NB and stay under
# the 32MB scoped-vmem limit. SK_ENC_BWD_VMEM_MB overrides for on-chip
# budget sweeps (tools/ab_packed_softmax.py --vmem; read at import).
BWD_ACT_VMEM_BUDGET = int(
    os.environ.get("SK_ENC_BWD_VMEM_MB", "32")) * 1024 * 1024

_WKEYS = ("ln1s", "ln1b", "wqkv", "bqkv", "qns", "qnb", "kns", "knb",
          "wo", "bo", "ln2s", "ln2b", "w1", "b1", "w2", "b2")


def _ln_fwd32(x, s, b):
    """f32 LayerNorm returning (y_f32, xhat, rstd) for reuse in bwd."""
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(x32 * x32, axis=-1, keepdims=True) - mu * mu, 0.0)
    rstd = jax.lax.rsqrt(var + LN_EPS)
    xhat = (x32 - mu) * rstd
    return xhat * s + b, xhat, rstd


def _ln_bwd32(dy32, xhat, rstd, s):
    """dx (f32) + (dscale, dbias) rows for LN over the minor axis."""
    dxhat = dy32 * s
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = rstd * (dxhat - m1 - xhat * m2)
    ds = jnp.sum(dy32 * xhat, axis=tuple(range(dy32.ndim - 1)))
    db = jnp.sum(dy32, axis=tuple(range(dy32.ndim - 1)))
    return dx, ds, db


def _mm(a, b, dims):
    return jax.lax.dot_general(a, b, dims,
                               preferred_element_type=jnp.float32)


# 2-D contraction specs
_NN = (((1,), (0,)), ((), ()))     # (M,K)@(K,N)
_NT = (((1,), (1,)), ((), ()))     # (M,K)@(N,K)^T
_TN = (((0,), (0,)), ((), ()))     # (M,K)^T@(M,N) -> (K,N)


def _layer_bwd_kernel(
    x_ref, g_ref, bias_ref, drop_ref,
    ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref,
    qns_ref, qnb_ref, kns_ref, knb_ref,
    wo_ref, bo_ref, ln2s_ref, ln2b_ref,
    w1_ref, b1_ref, w2_ref, b2_ref,
    dx_ref,
    dln1s_ref, dln1b_ref, dwqkv_ref, dbqkv_ref,
    dqns_ref, dqnb_ref, dkns_ref, dknb_ref,
    dwo_ref, dbo_ref, dln2s_ref, dln2b_ref,
    dw1_ref, db1_ref, dw2_ref, db2_ref,
    *, H, Dh, scale, use_mask, qk_norm, drop_thresh,
    drop_impl="bits", layer=0, packed=False,
):
    NB, T, d = x_ref.shape
    dt = x_ref.dtype
    M = NB * T
    HD = H * Dh
    f32 = jnp.float32
    x = x_ref[:].reshape(M, d)
    g32 = g_ref[:].reshape(M, d).astype(f32)
    ln1s = ln1s_ref[0:1, :]
    ln2s = ln2s_ref[0:1, :]
    if drop_thresh > 0:
        # this layer's two site masks, identical to the fwd kernel's:
        # 'bits' reads the shared external u8 tensor; 'prng' regenerates
        # the per-(site, batch-element) hardware-PRNG streams (the draw is
        # grid-NB-invariant, so fwd NB != bwd NB is fine)
        ks = 1.0 / (1.0 - drop_thresh / 256.0)
        if drop_impl == "prng":
            lbytes = pdrop.draw_layer_bytes(
                drop_ref[0], layer, pl.program_id(0), NB, T, d, 2)
        else:
            # i32 widen: Mosaic has no u8 compare on this target
            lbytes = [drop_ref[s].reshape(M, d).astype(jnp.int32)
                      for s in range(2)]
        m_attn = jnp.where(lbytes[0] >= drop_thresh, ks, 0.0
                           ).astype(f32)
        m_ffn = jnp.where(lbytes[1] >= drop_thresh, ks, 0.0
                          ).astype(f32)

    # ---------------- recompute forward ----------------------------------
    h1_32, xhat1, rstd1 = _ln_fwd32(x, ln1s, ln1b_ref[0:1, :])
    h1 = h1_32.astype(dt)
    qkv = (_mm(h1, wqkv_ref[:], _NN).astype(dt)
           + bqkv_ref[0:1, :].astype(dt))            # (M, 3HD)
    qkv3 = qkv.reshape(NB, T, 3 * HD)
    if use_mask:
        kbias = bias_ref[:]
    if packed:
        # hpp = 128//Dh heads per full-lane group pane; qk-norm params
        # arrive pre-tiled (1, 128) rows (pallas_packed docs)
        groups = []
        outs = []
        for gg in range(HD // 128):
            q0 = qkv3[:, :, gg * 128:(gg + 1) * 128]
            k0 = qkv3[:, :, HD + gg * 128:HD + (gg + 1) * 128]
            v = qkv3[:, :, 2 * HD + gg * 128:2 * HD + (gg + 1) * 128]
            if qk_norm:
                q32, qxh, qrs = pk.ln_blocks_fwd32(
                    q0, qns_ref[0:1, :], qnb_ref[0:1, :], Dh)
                k32, kxh, krs = pk.ln_blocks_fwd32(
                    k0, kns_ref[0:1, :], knb_ref[0:1, :], Dh)
                q, k = q32.astype(dt), k32.astype(dt)
            else:
                q, k = q0, k0
                qxh = qrs = kxh = krs = None
            o, res = pk.group_attn_fwd(
                q, k, v, dh=Dh, scale=scale, dt=dt,
                bias=kbias if use_mask else None, save=True)
            outs.append(o.astype(dt))
            groups.append((q, res, qxh, qrs, kxh, krs))
    else:
        heads = []   # per-head saved (q, k, v, p, [qk-norm residuals])
        outs = []
    for hh in range(H if not packed else 0):
        q0 = qkv3[:, :, hh * Dh:(hh + 1) * Dh]
        k0 = qkv3[:, :, HD + hh * Dh:HD + (hh + 1) * Dh]
        v = qkv3[:, :, 2 * HD + hh * Dh:2 * HD + (hh + 1) * Dh]
        if qk_norm:
            q32, qxhat, qrstd = _ln_fwd32(q0, qns_ref[0:1, :],
                                          qnb_ref[0:1, :])
            k32, kxhat, krstd = _ln_fwd32(k0, kns_ref[0:1, :],
                                          knb_ref[0:1, :])
            q, k = q32.astype(dt), k32.astype(dt)
        else:
            q, k = q0, k0
            qxhat = qrstd = kxhat = krstd = None
        s = _mm(q, k, (((2,), (2,)), ((0,), (0,)))) * scale
        if use_mask:
            s = s + kbias
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)   # (NB, T, T) f32
        o = _mm(p.astype(dt), v, (((2,), (1,)), ((0,), (0,))))
        outs.append(o.astype(dt))
        heads.append((q, k, v, p, qxhat, qrstd, kxhat, krstd))
    attn_c = jnp.concatenate(outs, axis=-1).reshape(M, HD)
    attn = (_mm(attn_c, wo_ref[:], _NN).astype(dt)
            + bo_ref[0:1, :].astype(dt))
    if drop_thresh > 0:
        attn = (attn.astype(f32) * m_attn).astype(dt)
    x1 = x + attn
    h2_32, xhat2, rstd2 = _ln_fwd32(x1, ln2s, ln2b_ref[0:1, :])
    h2 = h2_32.astype(dt)
    pre1 = (_mm(h2, w1_ref[:], _NN).astype(dt)
            + b1_ref[0:1, :].astype(dt))             # (M, dff)
    f1 = jnp.maximum(pre1, 0)

    # ---------------- backward -------------------------------------------
    first = pl.program_id(0) == 0

    def acc(ref, val):
        @pl.when(first)
        def _():
            ref[:] = jnp.zeros_like(ref)
        ref[:] += val.astype(ref.dtype)

    # FFN branch: y = x1 + drop(relu(LN2(x1)@W1+b1)@W2+b2)
    df = g32 if drop_thresh == 0 else g32 * m_ffn     # (M, d)
    acc(dw2_ref, _mm(f1, df.astype(dt), _TN))
    acc(db2_ref, jnp.sum(df, axis=0, keepdims=True))
    df1 = _mm(df.astype(dt), w2_ref[:], _NT)          # (M, dff) f32
    # f32 widen for the compare: Mosaic has no bf16 compare on this target
    dpre1 = jnp.where(pre1.astype(f32) > 0, df1, 0.0)
    acc(dw1_ref, _mm(h2, dpre1.astype(dt), _TN))
    acc(db1_ref, jnp.sum(dpre1, axis=0, keepdims=True))
    dh2 = _mm(dpre1.astype(dt), w1_ref[:], _NT)       # (M, d) f32
    dx1_ln, ds2, db2_ = _ln_bwd32(dh2, xhat2, rstd2, ln2s)
    acc(dln2s_ref, ds2[None, :])
    acc(dln2b_ref, db2_[None, :])
    dx1 = g32 + dx1_ln                                # (M, d) f32

    # attention branch: x1 = x + drop(attn_c@Wo + bo)
    datt = dx1 if drop_thresh == 0 else dx1 * m_attn
    acc(dwo_ref, _mm(attn_c, datt.astype(dt), _TN))
    acc(dbo_ref, jnp.sum(datt, axis=0, keepdims=True))
    do_c = _mm(datt.astype(dt), wo_ref[:], _NT)       # (M, HD) f32
    do3 = do_c.reshape(NB, T, HD)
    dq_parts, dk_parts, dv_parts = [], [], []
    dqns = dqnb = dkns = dknb = None
    if packed:
        for gg in range(HD // 128):
            q, res_g, qxh, qrs, kxh, krs = groups[gg]
            do_g = do3[:, :, gg * 128:(gg + 1) * 128]
            dq, dk, dv = pk.group_attn_bwd(
                do_g, q, res_g, dh=Dh, scale=scale, dt=dt)
            if qk_norm:
                dq, dqs, dqb = pk.ln_blocks_bwd32(
                    dq, qxh, qrs, qns_ref[0:1, :], Dh)
                dk, dks, dkb = pk.ln_blocks_bwd32(
                    dk, kxh, krs, kns_ref[0:1, :], Dh)
                dqns = dqs if dqns is None else dqns + dqs
                dqnb = dqb if dqnb is None else dqnb + dqb
                dkns = dks if dkns is None else dkns + dks
                dknb = dkb if dknb is None else dknb + dkb
            dq_parts.append(dq)
            dk_parts.append(dk)
            dv_parts.append(dv)
        if qk_norm:
            acc(dqns_ref, dqns)
            acc(dqnb_ref, dqnb)
            acc(dkns_ref, dkns)
            acc(dknb_ref, dknb)
        else:
            for ref in (dqns_ref, dqnb_ref, dkns_ref, dknb_ref):
                acc(ref, jnp.zeros(ref.shape, f32))
        dqkv = jnp.concatenate(
            dq_parts + dk_parts + dv_parts, axis=-1).reshape(M, 3 * HD)
        acc(dwqkv_ref, _mm(h1, dqkv.astype(dt), _TN))
        acc(dbqkv_ref, jnp.sum(dqkv, axis=0, keepdims=True))
        dh1 = _mm(dqkv.astype(dt), wqkv_ref[:], _NT)
        dx_ln, ds1, db1_ = _ln_bwd32(dh1, xhat1, rstd1, ln1s)
        acc(dln1s_ref, ds1[None, :])
        acc(dln1b_ref, db1_[None, :])
        dx_ref[:] = (dx1 + dx_ln).astype(dx_ref.dtype).reshape(NB, T, d)
        return
    for hh in range(H):
        q, k, v, p, qxhat, qrstd, kxhat, krstd = heads[hh]
        do_h = do3[:, :, hh * Dh:(hh + 1) * Dh].astype(dt)
        dv = _mm(p.astype(dt), do_h, (((1,), (1,)), ((0,), (0,))))
        dp = _mm(do_h, v, (((2,), (2,)), ((0,), (0,))))
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        ds_lp = ds.astype(dt)
        dq = _mm(ds_lp, k, (((2,), (1,)), ((0,), (0,)))) * scale
        dk = _mm(ds_lp, q, (((1,), (1,)), ((0,), (0,)))) * scale
        if qk_norm:
            dq, dqs, dqb = _ln_bwd32(dq, qxhat, qrstd, qns_ref[0:1, :])
            dk, dks, dkb = _ln_bwd32(dk, kxhat, krstd, kns_ref[0:1, :])
            dqns = dqs if dqns is None else dqns + dqs
            dqnb = dqb if dqnb is None else dqnb + dqb
            dkns = dks if dkns is None else dkns + dks
            dknb = dkb if dknb is None else dknb + dkb
        dq_parts.append(dq)
        dk_parts.append(dk)
        dv_parts.append(dv)
    if qk_norm:
        acc(dqns_ref, dqns[None, :])
        acc(dqnb_ref, dqnb[None, :])
        acc(dkns_ref, dkns[None, :])
        acc(dknb_ref, dknb[None, :])
    else:
        acc(dqns_ref, jnp.zeros((1, Dh), f32))
        acc(dqnb_ref, jnp.zeros((1, Dh), f32))
        acc(dkns_ref, jnp.zeros((1, Dh), f32))
        acc(dknb_ref, jnp.zeros((1, Dh), f32))
    dqkv = jnp.concatenate(
        dq_parts + dk_parts + dv_parts, axis=-1).reshape(M, 3 * HD)
    acc(dwqkv_ref, _mm(h1, dqkv.astype(dt), _TN))
    acc(dbqkv_ref, jnp.sum(dqkv, axis=0, keepdims=True))
    dh1 = _mm(dqkv.astype(dt), wqkv_ref[:], _NT)      # (M, d) f32
    dx_ln, ds1, db1_ = _ln_bwd32(dh1, xhat1, rstd1, ln1s)
    acc(dln1s_ref, ds1[None, :])
    acc(dln1b_ref, db1_[None, :])
    dx_ref[:] = (dx1 + dx_ln).astype(dx_ref.dtype).reshape(NB, T, d)


def _pad128(n: int) -> int:
    """Mosaic lane padding: the minor dim of every VMEM pane rounds up to
    128 lanes — a (T, 32) per-head pane costs as much as (T, 128). Small
    head_dim / cross-memory configs amplify 4-32x without this."""
    return ((n + 127) // 128) * 128


def _bwd_batches_per_cell(B, T, d, dff, H, itemsize, packed=False):
    d_p, dff_p, T_p = _pad128(d), _pad128(dff), _pad128(T)
    if packed:
        # packed group layout (pallas_packed): qkv/dqkv and the dq/dk/dv
        # group accumulators are full-lane (M, H*Dh) / (M, 128) panes —
        # NO per-head Dh->128 lane padding. Only the DOMINANT persistent
        # panes are counted; the block-diagonal K̃/Ṽ expansions and their
        # f32 gradient twins are transient per-group values the 32 MB
        # budget's slack absorbs (v5e VMEM is 128 MB). Round 3 reused
        # the per-head padded estimate here, which inflated 4x at Dh=32
        # and halved the h8 grid NB (8 vs the flagship's 16) — smaller
        # per-cell matmuls across the WHOLE layer for no VMEM reason.
        # Measured on-chip (B=512, T=96, H=8): 8,687 -> 9,299 sk/s train
        # from this accounting change alone (docs/PERF_TRAIN.md round 4).
        HD = (d // H) * H
        groups = max(HD // 128, 1)
        per_batch = (
            14 * T * d_p * itemsize         # x/g/h1/x1/h2/attn/do/dx + f32
            + 2 * T * 3 * HD * itemsize     # qkv + dqkv (unpadded lanes)
            + 2 * T * dff_p * itemsize      # pre1 + dpre1
            + (H + 2) * T * T_p * 4         # stored p chunks + live dp/ds
            + 3 * groups * T * 128 * 4      # dq/dk/dv f32 group panes
            + 2 * T * d_p                   # u8 dropout bits
        )
    else:
        Dh_p = _pad128(d // H)
        per_batch = (
            14 * T * d_p * itemsize         # x/g/h1/x1/h2/attn/do/dx + f32
            + 2 * T * 3 * H * Dh_p * itemsize   # qkv + dqkv
            + 2 * T * dff_p * itemsize      # pre1 + dpre1
            + (H + 2) * T * T_p * 4         # stored p per head + live dp/ds
            + 3 * H * T * Dh_p * 4          # dq/dk/dv f32 parts
            + 2 * T * d_p                   # u8 dropout bits
        )
    nb = max(1, BWD_ACT_VMEM_BUDGET // max(per_batch, 1))
    if packed:
        # Measured on-chip (B=512, T=96, H=8, round 4): ISOLATED enc
        # fwd+bwd prefers NB=8 (23.78 vs 25.85 ms at 16; 4: 25.30, 32:
        # 24.56) but the FULL train step prefers NB=16 (9,213 sk/s vs
        # 9,093 at NB=8; 32 ties 16) — at NB=8 the doubled grid-cell
        # count loses more step-level overlap with the CE head and
        # optimizer than the per-kernel win saves. Full step is ground
        # truth; cap at 16. SK_PACKED_BWD_NB overrides for sweeps.
        nb = min(nb, int(os.environ.get("SK_PACKED_BWD_NB", "16")))
    while nb > 1 and B % nb:
        nb -= 1
    return nb


def _specs_x(NB, T, d):
    return pl.BlockSpec((NB, T, d), lambda g: (g, 0, 0),
                        memory_space=pltpu.VMEM)


def _spec_const(shape):
    zeros = (0,) * len(shape)
    return pl.BlockSpec(shape, lambda g, _z=zeros: _z,
                        memory_space=pltpu.VMEM)


def _layer_bwd(x, g, bias, drop, wl, *, H, Dh, scale, use_mask, qk_norm,
               drop_thresh, drop_impl="bits", layer=0, packed=False):
    """One layer's backward: returns (dx, dW dict) via one pallas call."""
    B, T, d = x.shape
    dff = wl["w1"].shape[1]
    NB = _bwd_batches_per_cell(B, T, d, dff, H, x.dtype.itemsize,
                               packed=packed)
    spec_x = _specs_x(NB, T, d)
    if use_mask:
        spec_bias = pl.BlockSpec((NB, 1, T), lambda g: (g, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        spec_bias = _spec_const(bias.shape)
    if drop_thresh > 0 and drop_impl == "prng":
        spec_drop = pl.BlockSpec(memory_space=pltpu.SMEM)  # (1,) seed
    elif drop_thresh > 0:
        spec_drop = pl.BlockSpec((2, NB, T, d), lambda g: (0, g, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        spec_drop = _spec_const(drop.shape)
    warg = [wl[k] for k in _WKEYS]
    dw_shapes = [jax.ShapeDtypeStruct(a.shape, jnp.float32) for a in warg]
    out_shape = (jax.ShapeDtypeStruct(x.shape, x.dtype), *dw_shapes)
    out_specs = (spec_x, *[_spec_const(a.shape) for a in warg])
    res = pl.pallas_call(
        functools.partial(
            _layer_bwd_kernel, H=H, Dh=Dh, scale=scale,
            use_mask=use_mask, qk_norm=qk_norm, drop_thresh=drop_thresh,
            drop_impl=drop_impl, layer=layer, packed=packed),
        grid=(B // NB,),
        in_specs=[spec_x, spec_x, spec_bias, spec_drop] + [
            _spec_const(a.shape) for a in warg],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_use_interpret(),
        compiler_params=pltpu.CompilerParams(
            # the f32 dW panes + large-NB recompute panes legitimately
            # exceed the 16MB default scoped-vmem limit; v5e has more
            vmem_limit_bytes=max(64 * 1024 * 1024,
                                 2 * BWD_ACT_VMEM_BUDGET)),
    )(x, g, bias, drop, *warg)
    dx = res[0]
    dwl = {k: v for k, v in zip(_WKEYS, res[1:])}
    return dx, dwl


# ---------------------------------------------------------------------------
# custom-VJP stack entry (final LN excluded — applied by the caller in XLA)
# ---------------------------------------------------------------------------


def _row(a):
    """Per-layer row of a stacked weight: (L, ...) -> (...) with 1-D
    params lifted to (1, d) panes for Mosaic."""
    return a if a.ndim >= 2 else a[None, :]


def _stack_fwd_call(x, bias, drop, wlist, *, L, H, Dh, use_mask, qk_norm,
                    drop_thresh, collect, drop_impl="bits", packed=False):
    B, T, d = x.shape
    dff = wlist[_WKEYS.index("w1")].shape[2]
    extra = 0
    if collect:
        extra += L * T * d * x.dtype.itemsize     # xins block
    if drop_thresh > 0 and drop_impl == "bits":
        extra += 2 * L * T * d                    # u8 dropout bits
    NB = _batches_per_cell(B, T, d, dff, H, x.dtype.itemsize,
                           extra_per_batch=extra)
    spec_x = _specs_x(NB, T, d)
    if use_mask:
        spec_bias = pl.BlockSpec((NB, 1, T), lambda g: (g, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        spec_bias = _spec_const(bias.shape)
    # dummy final-LN panes (final_ln=False)
    lnf = jnp.zeros((1, d), jnp.float32)
    wargs = list(wlist) + [lnf, lnf]
    in_specs = [spec_x, spec_bias] + [_spec_const(a.shape) for a in wargs]
    operands = [x, bias] + wargs
    if drop_thresh > 0:
        if drop_impl == "prng":
            in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        else:
            in_specs.append(
                pl.BlockSpec((2 * L, NB, T, d), lambda g: (0, g, 0, 0),
                             memory_space=pltpu.VMEM))
        operands.append(drop)
    out_shape = [jax.ShapeDtypeStruct(x.shape, x.dtype)]
    out_specs = [spec_x]
    if collect:
        out_shape.append(
            jax.ShapeDtypeStruct((L, B, T, d), x.dtype))
        out_specs.append(
            pl.BlockSpec((L, NB, T, d), lambda g: (0, g, 0, 0),
                         memory_space=pltpu.VMEM))
    res = pl.pallas_call(
        functools.partial(
            _stack_kernel, L=L, H=H, Dh=Dh, scale=1.0 / (Dh ** 0.5),
            use_mask=use_mask, qk_norm=qk_norm, final_ln=False,
            collect_inputs=collect, drop_thresh=drop_thresh,
            drop_impl=drop_impl, packed=packed),
        grid=(B // NB,),
        in_specs=in_specs,
        out_specs=tuple(out_specs) if collect else out_specs[0],
        out_shape=tuple(out_shape) if collect else out_shape[0],
        interpret=_use_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
    )(*operands)
    return res if collect else (res, None)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _stack_train(x, bias, drop, L, H, Dh, flags, *wlist):
    use_mask, qk_norm, drop_thresh, drop_impl, packed = flags
    y, _ = _stack_fwd_call(x, bias, drop, wlist, L=L, H=H, Dh=Dh,
                           use_mask=use_mask, qk_norm=qk_norm,
                           drop_thresh=drop_thresh, collect=False,
                           drop_impl=drop_impl, packed=packed)
    return y


def _stack_train_fwd(x, bias, drop, L, H, Dh, flags, *wlist):
    use_mask, qk_norm, drop_thresh, drop_impl, packed = flags
    y, xins = _stack_fwd_call(x, bias, drop, wlist, L=L, H=H, Dh=Dh,
                              use_mask=use_mask, qk_norm=qk_norm,
                              drop_thresh=drop_thresh, collect=True,
                              drop_impl=drop_impl, packed=packed)
    return y, (xins, bias, drop, wlist)


def _stack_train_bwd(L, H, Dh, flags, res, g):
    use_mask, qk_norm, drop_thresh, drop_impl, packed = flags
    xins, bias, drop, wlist = res
    scale = 1.0 / (Dh ** 0.5)
    dws = []
    for i in reversed(range(L)):
        wl = {k: _row(a[i]) for k, a in zip(_WKEYS, wlist)}
        if drop_thresh > 0 and drop_impl == "bits":
            drop_i = drop[2 * i:2 * i + 2]
        else:
            drop_i = drop           # (1,) prng seed, or unused dummy
        g, dwl = _layer_bwd(xins[i], g, bias, drop_i, wl, H=H, Dh=Dh,
                            scale=scale, use_mask=use_mask,
                            qk_norm=qk_norm, drop_thresh=drop_thresh,
                            drop_impl=drop_impl, layer=i, packed=packed)
        dws.append(dwl)
    dws = dws[::-1]
    dwlist = []
    for k, a in zip(_WKEYS, wlist):
        stacked = jnp.stack([dw[k] for dw in dws])     # (L, ...) rows
        dwlist.append(stacked.reshape(a.shape).astype(a.dtype))
    return (g, None, None, *dwlist)


_stack_train.defvjp(_stack_train_fwd, _stack_train_bwd)


def fused_encoder_stack_train(
    x: jnp.ndarray,
    key_mask: Optional[jnp.ndarray],
    w: dict,
    *,
    num_heads: int,
    qk_norm: bool = False,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    dropout_impl: str = "auto",
) -> jnp.ndarray:
    """Differentiable fused encoder stack WITHOUT the final LayerNorm.

    The caller applies the stack's ``ln_out`` afterwards (one cheap XLA
    op), keeping the custom VJP scoped to the layer loop. ``w`` is the
    dict from ops.pallas_encoder.stack_encoder_weights (lnfs/lnfb unused).

    Dropout (two sites per layer: post-attention-projection and post-FFN,
    matching models/transformer.py) uses the u8-threshold semantics of
    models/dropout.py. ``dropout_impl``: 'bits' draws the bytes ONCE here
    in XLA and the fwd/bwd kernels consume them bit-for-bit; 'prng'
    regenerates them in-kernel from the hardware PRNG (no HBM bits
    traffic — TPU only); 'auto' picks 'prng' on TPU, 'bits' elsewhere.
    """
    B, T, d = x.shape
    L = w["wqkv"].shape[0]
    H = num_heads
    Dh = d // H
    use_mask = key_mask is not None
    if use_mask:
        bias = jnp.where(key_mask, 0.0, NEG_INF).astype(
            jnp.float32)[:, None, :]
    else:
        bias = jnp.zeros((1, 1), jnp.float32)
    thresh = int(round(dropout_rate * 256))
    impl = "bits"
    if thresh > 0:
        if dropout_rng is None:
            raise ValueError("dropout_rate > 0 requires dropout_rng")
        impl = pdrop.resolve_impl(dropout_impl)
        if impl == "prng":
            drop = pdrop.seed_from_rng(dropout_rng)
        else:
            drop = jax.random.bits(dropout_rng, (2 * L, B, T, d),
                                   dtype=jnp.uint8)
    else:
        drop = jnp.zeros((1, 1), jnp.uint8)
    # small-head geometries run PACKED (hpp=128/Dh heads per lane pane,
    # pallas_packed.py): qk-norm params tile to 128 lanes OUTSIDE the
    # custom VJP, so autodiff reduces their grads back to (L, Dh)
    packed = pk.packed_supported(d, H) and T % 8 == 0
    if packed:
        w = {**w, **{k: pk.tile_heads(w[k], 128 // Dh)
                     for k in ("qns", "qnb", "kns", "knb")}}
    wlist = [w[k] for k in _WKEYS]
    return _stack_train(x, bias, drop, L, H, Dh,
                        (use_mask, qk_norm, thresh, impl, packed), *wlist)


def apply_final_ln(y: jnp.ndarray, w: dict) -> jnp.ndarray:
    """The stack's ``ln_out`` as a plain differentiable XLA op (f32 stats,
    same math as the in-kernel _ln) — pairs with fused_encoder_stack_train."""
    x32 = y.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(x32 * x32, axis=-1, keepdims=True) - mu * mu, 0.0)
    xhat = (x32 - mu) * jax.lax.rsqrt(var + LN_EPS)
    return (xhat * w["lnfs"][0] + w["lnfb"][0]).astype(y.dtype)
