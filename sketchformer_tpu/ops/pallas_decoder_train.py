"""Fused decoder-stack training path: stack forward + per-layer backward.

The decoder twin of ops/pallas_encoder_train.py, for the teacher-forced
training/eval forward (AR decode keeps its own KV-cached kernel in
ops/pallas_decode.py). Per pre-LN layer (models/transformer.py
DecoderLayer): causal masked self-attention, cross-attention to the
bottleneck memory (M = num_queries rows, typically 4 — tiny), FFN; three
dropout sites (post-self-proj, post-cross-proj, post-FFN).

Same design as the encoder pair:
- forward: ONE pallas call for all L layers, VMEM-resident activations,
  optional collect_inputs emitting each layer's residual-stream input.
- backward: one kernel per layer, recomputing internals in VMEM from the
  saved layer input; weight grads accumulate in f32 across batch grid
  cells via output revisiting; also emits dmemory (summed across layers
  by the VJP wrapper).
- dropout bits are an external (3L, B, T, d) u8 input with the
  u8-threshold semantics of models/dropout.py, shared by fwd and bwd.
- the final ``ln_out`` runs outside in XLA for the train path.

Causal masking is an in-kernel iota — no (T, T) mask tensor anywhere.
Gradient parity is pinned by tests/test_pallas_decoder_train.py.
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
    _ln,
    _use_interpret,
)
from sketchformer_tpu.ops.pallas_encoder_train import (
    _ln_bwd32,
    _ln_fwd32,
    _mm,
    _NN,
    _NT,
    _TN,
    _row,
    _spec_const,
    _specs_x,
)

FWD_ACT_VMEM_BUDGET = int(
    os.environ.get("SK_DEC_FWD_VMEM_MB", "6")) * 1024 * 1024
# Tuned on v5e: flagship (d256/H2, B=512/T=96) lands on NB=16 under the
# raised 64MB scoped-vmem limit — full train step 59.9 -> 58.2ms
# (8,803 sk/s); NB=8 was the 19MB result, NB=4 the 12MB one (grid cells
# too small). Estimate is lane-padding-aware (see encoder twin).
# SK_DEC_BWD_VMEM_MB overrides for on-chip budget sweeps.
BWD_ACT_VMEM_BUDGET = int(
    os.environ.get("SK_DEC_BWD_VMEM_MB", "40")) * 1024 * 1024

_DWKEYS = (
    "ln1s", "ln1b", "s_wqkv", "s_bqkv", "s_qns", "s_qnb", "s_kns", "s_knb",
    "s_wo", "s_bo",
    "ln2s", "ln2b", "c_wq", "c_bq", "c_wkv", "c_bkv", "c_qns", "c_qnb",
    "c_kns", "c_knb", "c_wo", "c_bo",
    "ln3s", "ln3b", "w1", "b1", "w2", "b2",
)


def _causal_bias(T):
    row = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
    return jnp.where(col <= row, 0.0, NEG_INF)[None]     # (1, T, T) f32


def _softmax_rows(s):
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _dec_stack_kernel(
    x_ref, mem_ref, sbias_ref, cbias_ref,
    ln1s_ref, ln1b_ref, swqkv_ref, sbqkv_ref,
    sqns_ref, sqnb_ref, skns_ref, sknb_ref, swo_ref, sbo_ref,
    ln2s_ref, ln2b_ref, cwq_ref, cbq_ref, cwkv_ref, cbkv_ref,
    cqns_ref, cqnb_ref, ckns_ref, cknb_ref, cwo_ref, cbo_ref,
    ln3s_ref, ln3b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
    lnfs_ref, lnfb_ref,
    *refs, **kw,
):
    L = kw["L"]; H = kw["H"]; Dh = kw["Dh"]; scale = kw["scale"]
    use_smask = kw["use_smask"]; use_cmask = kw["use_cmask"]
    qk_norm = kw["qk_norm"]
    packed = kw.get("packed", False)
    final_ln = kw.get("final_ln", True)
    collect = kw.get("collect_inputs", False)
    thresh = kw.get("drop_thresh", 0)
    drop_impl = kw.get("drop_impl", "bits")
    refs = list(refs)              # [drop_ref | seed_ref?] o_ref [xins_ref?]
    drop_ref = seed_ref = None
    if thresh > 0:
        if drop_impl == "prng":
            seed_ref = refs.pop(0)             # (1,) int32 in SMEM
        else:
            drop_ref = refs.pop(0)
    o_ref = refs.pop(0)
    xins_ref = refs.pop(0) if collect else None

    NB, T, d = x_ref.shape
    Mq = mem_ref.shape[1]
    dt = x_ref.dtype
    M = NB * T
    HD = H * Dh
    x = x_ref[:].reshape(M, d)
    mem = mem_ref[:].reshape(NB * Mq, d)
    causal = _causal_bias(T)
    sbias = sbias_ref[:] if use_smask else None      # (NB, 1, T)
    cbias = cbias_ref[:] if use_cmask else None      # (NB, 1, Mq)
    keep_scale = None
    if thresh > 0:
        keep_scale = jnp.asarray(1.0 / (1.0 - thresh / 256.0), dt)

    def drop(val, site, bpane=None):
        if thresh == 0:
            return val
        if drop_impl == "prng":
            bits = bpane        # pre-drawn (M, d) byte pane for this site
        else:
            bits = drop_ref[site].reshape(M, d).astype(jnp.int32)
        return jnp.where(bits >= thresh, val * keep_scale, 0).astype(dt)

    for i in range(L):
        if collect:
            xins_ref[i] = x.reshape(NB, T, d)
        if thresh > 0 and drop_impl == "prng":
            # one PRNG draw per layer serves all 3 sites (bytes 0..2)
            lbytes = pdrop.draw_layer_bytes(
                seed_ref[0], i, pl.program_id(0), NB, T, d, 3)
        else:
            lbytes = (None, None, None)
        # ---- causal self-attention --------------------------------------
        h = _ln(x, ln1s_ref, ln1b_ref, i, dt)
        qkv = (_mm(h, swqkv_ref[i], _NN).astype(dt)
               + sbqkv_ref[i:i + 1, :].astype(dt)).reshape(NB, T, 3 * HD)
        outs = []
        if packed:
            # hpp = 128//Dh heads per full-lane group pane; qk-norm
            # params arrive pre-tiled (L, 128) (pallas_packed docs)
            for gg in range(HD // 128):
                q = qkv[:, :, gg * 128:(gg + 1) * 128]
                k = qkv[:, :, HD + gg * 128:HD + (gg + 1) * 128]
                v = qkv[:, :, 2 * HD + gg * 128:2 * HD + (gg + 1) * 128]
                if qk_norm:
                    q = pk.ln_blocks_fwd32(
                        q, sqns_ref[i:i + 1, :], sqnb_ref[i:i + 1, :],
                        Dh)[0].astype(dt)
                    k = pk.ln_blocks_fwd32(
                        k, skns_ref[i:i + 1, :], sknb_ref[i:i + 1, :],
                        Dh)[0].astype(dt)
                o = pk.group_attn_fwd(
                    q, k, v, dh=Dh, scale=scale, dt=dt,
                    bias=sbias if use_smask else None, causal=causal)
                outs.append(o.astype(dt))
        else:
            for hh in range(H):
                q = qkv[:, :, hh * Dh:(hh + 1) * Dh]
                k = qkv[:, :, HD + hh * Dh:HD + (hh + 1) * Dh]
                v = qkv[:, :, 2 * HD + hh * Dh:2 * HD + (hh + 1) * Dh]
                if qk_norm:
                    q = _ln(q, sqns_ref, sqnb_ref, i, dt)
                    k = _ln(k, skns_ref, sknb_ref, i, dt)
                s = _mm(q, k, (((2,), (2,)), ((0,), (0,)))) * scale + causal
                if use_smask:
                    s = s + sbias
                p = _softmax_rows(s)
                outs.append(
                    _mm(p.astype(dt), v,
                        (((2,), (1,)), ((0,), (0,)))).astype(dt))
        attn = jnp.concatenate(outs, axis=-1).reshape(M, HD)
        attn = (_mm(attn, swo_ref[i], _NN).astype(dt)
                + sbo_ref[i:i + 1, :].astype(dt))
        x = x + drop(attn, 3 * i, lbytes[0])
        # ---- cross-attention to memory ----------------------------------
        h = _ln(x, ln2s_ref, ln2b_ref, i, dt)
        cq = (_mm(h, cwq_ref[i], _NN).astype(dt)
              + cbq_ref[i:i + 1, :].astype(dt)).reshape(NB, T, HD)
        ckv = (_mm(mem, cwkv_ref[i], _NN).astype(dt)
               + cbkv_ref[i:i + 1, :].astype(dt)).reshape(NB, Mq, 2 * HD)
        outs = []
        if packed:
            mq8 = ((Mq + 7) // 8) * 8    # 8-aligned sublane score chunks
            for gg in range(HD // 128):
                q = cq[:, :, gg * 128:(gg + 1) * 128]
                k = ckv[:, :, gg * 128:(gg + 1) * 128]
                v = ckv[:, :, HD + gg * 128:HD + (gg + 1) * 128]
                if qk_norm:
                    q = pk.ln_blocks_fwd32(
                        q, cqns_ref[i:i + 1, :], cqnb_ref[i:i + 1, :],
                        Dh)[0].astype(dt)
                    k = pk.ln_blocks_fwd32(
                        k, ckns_ref[i:i + 1, :], cknb_ref[i:i + 1, :],
                        Dh)[0].astype(dt)
                kp, vp, bp = pk.pad_kv_rows(
                    k, v, cbias if use_cmask else None, mq8)
                o = pk.group_attn_fwd(
                    q, kp, vp, dh=Dh, scale=scale, dt=dt, bias=bp)
                outs.append(o.astype(dt))
        else:
            for hh in range(H):
                q = cq[:, :, hh * Dh:(hh + 1) * Dh]
                k = ckv[:, :, hh * Dh:(hh + 1) * Dh]
                v = ckv[:, :, HD + hh * Dh:HD + (hh + 1) * Dh]
                if qk_norm:
                    q = _ln(q, cqns_ref, cqnb_ref, i, dt)
                    k = _ln(k, ckns_ref, cknb_ref, i, dt)
                s = _mm(q, k, (((2,), (2,)), ((0,), (0,)))) * scale
                if use_cmask:
                    s = s + cbias
                p = _softmax_rows(s)                  # (NB, T, Mq)
                outs.append(
                    _mm(p.astype(dt), v,
                        (((2,), (1,)), ((0,), (0,)))).astype(dt))
        cattn = jnp.concatenate(outs, axis=-1).reshape(M, HD)
        cattn = (_mm(cattn, cwo_ref[i], _NN).astype(dt)
                 + cbo_ref[i:i + 1, :].astype(dt))
        x = x + drop(cattn, 3 * i + 1, lbytes[1])
        # ---- FFN ---------------------------------------------------------
        h = _ln(x, ln3s_ref, ln3b_ref, i, dt)
        h = (_mm(h, w1_ref[i], _NN).astype(dt)
             + b1_ref[i:i + 1, :].astype(dt))
        h = jnp.maximum(h, 0)
        h = (_mm(h, w2_ref[i], _NN).astype(dt)
             + b2_ref[i:i + 1, :].astype(dt))
        x = x + drop(h, 3 * i + 2, lbytes[2])

    if final_ln:
        x = _ln(x, lnfs_ref, lnfb_ref, 0, dt)
    o_ref[:] = x.reshape(NB, T, d).astype(o_ref.dtype)


def _dec_layer_bwd_kernel(
    x_ref, mem_ref, g_ref, sbias_ref, cbias_ref, drop_ref,
    ln1s_ref, ln1b_ref, swqkv_ref, sbqkv_ref,
    sqns_ref, sqnb_ref, skns_ref, sknb_ref, swo_ref, sbo_ref,
    ln2s_ref, ln2b_ref, cwq_ref, cbq_ref, cwkv_ref, cbkv_ref,
    cqns_ref, cqnb_ref, ckns_ref, cknb_ref, cwo_ref, cbo_ref,
    ln3s_ref, ln3b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
    dx_ref, dmem_ref,
    dln1s_ref, dln1b_ref, dswqkv_ref, dsbqkv_ref,
    dsqns_ref, dsqnb_ref, dskns_ref, dsknb_ref, dswo_ref, dsbo_ref,
    dln2s_ref, dln2b_ref, dcwq_ref, dcbq_ref, dcwkv_ref, dcbkv_ref,
    dcqns_ref, dcqnb_ref, dckns_ref, dcknb_ref, dcwo_ref, dcbo_ref,
    dln3s_ref, dln3b_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
    *, H, Dh, scale, use_smask, use_cmask, qk_norm, drop_thresh,
    drop_impl="bits", layer=0, packed=False,
):
    NB, T, d = x_ref.shape
    Mq = mem_ref.shape[1]
    dt = x_ref.dtype
    M = NB * T
    HD = H * Dh
    f32 = jnp.float32
    x = x_ref[:].reshape(M, d)
    mem = mem_ref[:].reshape(NB * Mq, d)
    g32 = g_ref[:].reshape(M, d).astype(f32)
    causal = _causal_bias(T)
    masks = []
    if drop_thresh > 0:
        ks = 1.0 / (1.0 - drop_thresh / 256.0)
        if drop_impl == "prng":
            lbytes = pdrop.draw_layer_bytes(
                drop_ref[0], layer, pl.program_id(0), NB, T, d, 3)
        else:
            lbytes = [drop_ref[s].reshape(M, d).astype(jnp.int32)
                      for s in range(3)]
        for site in range(3):
            masks.append(jnp.where(
                lbytes[site] >= drop_thresh, ks, 0.0).astype(f32))

    first = pl.program_id(0) == 0

    def acc(ref, val):
        @pl.when(first)
        def _():
            ref[:] = jnp.zeros_like(ref)
        ref[:] += val.astype(ref.dtype)

    # ---------------- recompute forward ----------------------------------
    h1_32, xhat1, rstd1 = _ln_fwd32(x, ln1s_ref[0:1, :], ln1b_ref[0:1, :])
    h1 = h1_32.astype(dt)
    qkv = (_mm(h1, swqkv_ref[:], _NN).astype(dt)
           + sbqkv_ref[0:1, :].astype(dt)).reshape(NB, T, 3 * HD)
    sheads, souts = [], []
    if packed:
        for gg in range(HD // 128):
            q0 = qkv[:, :, gg * 128:(gg + 1) * 128]
            k0 = qkv[:, :, HD + gg * 128:HD + (gg + 1) * 128]
            v = qkv[:, :, 2 * HD + gg * 128:2 * HD + (gg + 1) * 128]
            if qk_norm:
                q32, qxh, qrs = pk.ln_blocks_fwd32(
                    q0, sqns_ref[0:1, :], sqnb_ref[0:1, :], Dh)
                k32, kxh, krs = pk.ln_blocks_fwd32(
                    k0, skns_ref[0:1, :], sknb_ref[0:1, :], Dh)
                q, k = q32.astype(dt), k32.astype(dt)
            else:
                q, k = q0, k0
                qxh = qrs = kxh = krs = None
            o, res = pk.group_attn_fwd(
                q, k, v, dh=Dh, scale=scale, dt=dt,
                bias=sbias_ref[:] if use_smask else None,
                causal=causal, save=True)
            souts.append(o.astype(dt))
            sheads.append((q, res, qxh, qrs, kxh, krs))
    for hh in range(H if not packed else 0):
        q0 = qkv[:, :, hh * Dh:(hh + 1) * Dh]
        k0 = qkv[:, :, HD + hh * Dh:HD + (hh + 1) * Dh]
        v = qkv[:, :, 2 * HD + hh * Dh:2 * HD + (hh + 1) * Dh]
        if qk_norm:
            q32, qxh, qrs = _ln_fwd32(q0, sqns_ref[0:1, :],
                                      sqnb_ref[0:1, :])
            k32, kxh, krs = _ln_fwd32(k0, skns_ref[0:1, :],
                                      sknb_ref[0:1, :])
            q, k = q32.astype(dt), k32.astype(dt)
        else:
            q, k = q0, k0
            qxh = qrs = kxh = krs = None
        s = _mm(q, k, (((2,), (2,)), ((0,), (0,)))) * scale + causal
        if use_smask:
            s = s + sbias_ref[:]
        p = _softmax_rows(s)
        souts.append(_mm(p.astype(dt), v,
                         (((2,), (1,)), ((0,), (0,)))).astype(dt))
        sheads.append((q, k, v, p, qxh, qrs, kxh, krs))
    sattn_c = jnp.concatenate(souts, axis=-1).reshape(M, HD)
    sattn = (_mm(sattn_c, swo_ref[:], _NN).astype(dt)
             + sbo_ref[0:1, :].astype(dt))
    if drop_thresh > 0:
        sattn = (sattn.astype(f32) * masks[0]).astype(dt)
    x1 = x + sattn

    h2_32, xhat2, rstd2 = _ln_fwd32(x1, ln2s_ref[0:1, :], ln2b_ref[0:1, :])
    h2 = h2_32.astype(dt)
    cq = (_mm(h2, cwq_ref[:], _NN).astype(dt)
          + cbq_ref[0:1, :].astype(dt)).reshape(NB, T, HD)
    ckv = (_mm(mem, cwkv_ref[:], _NN).astype(dt)
           + cbkv_ref[0:1, :].astype(dt)).reshape(NB, Mq, 2 * HD)
    cheads, couts = [], []
    if packed:
        mq8 = ((Mq + 7) // 8) * 8
        for gg in range(HD // 128):
            q0 = cq[:, :, gg * 128:(gg + 1) * 128]
            k0 = ckv[:, :, gg * 128:(gg + 1) * 128]
            v = ckv[:, :, HD + gg * 128:HD + (gg + 1) * 128]
            if qk_norm:
                q32, qxh, qrs = pk.ln_blocks_fwd32(
                    q0, cqns_ref[0:1, :], cqnb_ref[0:1, :], Dh)
                k32, kxh, krs = pk.ln_blocks_fwd32(
                    k0, ckns_ref[0:1, :], cknb_ref[0:1, :], Dh)
                q, k = q32.astype(dt), k32.astype(dt)
            else:
                q, k = q0, k0
                qxh = qrs = kxh = krs = None
            kp, vp, bp = pk.pad_kv_rows(
                k, v, cbias_ref[:] if use_cmask else None, mq8)
            o, res = pk.group_attn_fwd(
                q, kp, vp, dh=Dh, scale=scale, dt=dt, bias=bp, save=True)
            couts.append(o.astype(dt))
            cheads.append((q, res, qxh, qrs, kxh, krs))
    for hh in range(H if not packed else 0):
        q0 = cq[:, :, hh * Dh:(hh + 1) * Dh]
        k0 = ckv[:, :, hh * Dh:(hh + 1) * Dh]
        v = ckv[:, :, HD + hh * Dh:HD + (hh + 1) * Dh]
        if qk_norm:
            q32, qxh, qrs = _ln_fwd32(q0, cqns_ref[0:1, :],
                                      cqnb_ref[0:1, :])
            k32, kxh, krs = _ln_fwd32(k0, ckns_ref[0:1, :],
                                      cknb_ref[0:1, :])
            q, k = q32.astype(dt), k32.astype(dt)
        else:
            q, k = q0, k0
            qxh = qrs = kxh = krs = None
        s = _mm(q, k, (((2,), (2,)), ((0,), (0,)))) * scale
        if use_cmask:
            s = s + cbias_ref[:]
        p = _softmax_rows(s)                          # (NB, T, Mq)
        couts.append(_mm(p.astype(dt), v,
                         (((2,), (1,)), ((0,), (0,)))).astype(dt))
        cheads.append((q, k, v, p, qxh, qrs, kxh, krs))
    cattn_c = jnp.concatenate(couts, axis=-1).reshape(M, HD)
    cattn = (_mm(cattn_c, cwo_ref[:], _NN).astype(dt)
             + cbo_ref[0:1, :].astype(dt))
    if drop_thresh > 0:
        cattn = (cattn.astype(f32) * masks[1]).astype(dt)
    x2 = x1 + cattn

    h3_32, xhat3, rstd3 = _ln_fwd32(x2, ln3s_ref[0:1, :], ln3b_ref[0:1, :])
    h3 = h3_32.astype(dt)
    pre1 = (_mm(h3, w1_ref[:], _NN).astype(dt)
            + b1_ref[0:1, :].astype(dt))
    f1 = jnp.maximum(pre1, 0)

    # ---------------- backward -------------------------------------------
    # FFN: y = x2 + drop(f1@W2+b2)
    df = g32 if drop_thresh == 0 else g32 * masks[2]
    acc(dw2_ref, _mm(f1, df.astype(dt), _TN))
    acc(db2_ref, jnp.sum(df, axis=0, keepdims=True))
    df1 = _mm(df.astype(dt), w2_ref[:], _NT)
    dpre1 = jnp.where(pre1.astype(f32) > 0, df1, 0.0)
    acc(dw1_ref, _mm(h3, dpre1.astype(dt), _TN))
    acc(db1_ref, jnp.sum(dpre1, axis=0, keepdims=True))
    dh3 = _mm(dpre1.astype(dt), w1_ref[:], _NT)
    dx2_ln, ds3, db3 = _ln_bwd32(dh3, xhat3, rstd3, ln3s_ref[0:1, :])
    acc(dln3s_ref, ds3[None, :])
    acc(dln3b_ref, db3[None, :])
    dx2 = g32 + dx2_ln

    # cross-attn: x2 = x1 + drop(cattn_c@cWo + cbo)
    dcatt = dx2 if drop_thresh == 0 else dx2 * masks[1]
    acc(dcwo_ref, _mm(cattn_c, dcatt.astype(dt), _TN))
    acc(dcbo_ref, jnp.sum(dcatt, axis=0, keepdims=True))
    do3 = _mm(dcatt.astype(dt), cwo_ref[:], _NT).reshape(NB, T, HD)
    dcq_parts, dckv_parts = [], []
    dcqns = dcqnb = dckns = dcknb = None
    if packed:
        mq8 = ((Mq + 7) // 8) * 8
        for gg in range(HD // 128):
            q, res_g, qxh, qrs, kxh, krs = cheads[gg]
            do_g = do3[:, :, gg * 128:(gg + 1) * 128]
            dq, dk, dv = pk.group_attn_bwd(
                do_g, q, res_g, dh=Dh, scale=scale, dt=dt)
            dk = dk[:, :Mq, :]           # drop cross-memory pad rows
            dv = dv[:, :Mq, :]
            if qk_norm:
                dq, a, b = pk.ln_blocks_bwd32(
                    dq, qxh, qrs, cqns_ref[0:1, :], Dh)
                a, b = a[0], b[0]
                dcqns = a if dcqns is None else dcqns + a
                dcqnb = b if dcqnb is None else dcqnb + b
                # kxh/krs were computed on the UNPADDED (NB, Mq, 128)
                # panes (qk-norm runs before pad_kv_rows)
                dk, a, b = pk.ln_blocks_bwd32(
                    dk, kxh, krs, ckns_ref[0:1, :], Dh)
                a, b = a[0], b[0]
                dckns = a if dckns is None else dckns + a
                dcknb = b if dcknb is None else dcknb + b
            dcq_parts.append(dq)
            dckv_parts.append((dk, dv))
    for hh in range(H if not packed else 0):
        q, k, v, p, qxh, qrs, kxh, krs = cheads[hh]
        do_h = do3[:, :, hh * Dh:(hh + 1) * Dh].astype(dt)
        dv = _mm(p.astype(dt), do_h, (((1,), (1,)), ((0,), (0,))))
        dp = _mm(do_h, v, (((2,), (2,)), ((0,), (0,))))
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        ds_lp = ds.astype(dt)
        dq = _mm(ds_lp, k, (((2,), (1,)), ((0,), (0,)))) * scale
        dk = _mm(ds_lp, q, (((1,), (1,)), ((0,), (0,)))) * scale
        if qk_norm:
            dq, a, b = _ln_bwd32(dq, qxh, qrs, cqns_ref[0:1, :])
            dcqns = a if dcqns is None else dcqns + a
            dcqnb = b if dcqnb is None else dcqnb + b
            dk, a, b = _ln_bwd32(dk, kxh, krs, ckns_ref[0:1, :])
            dckns = a if dckns is None else dckns + a
            dcknb = b if dcknb is None else dcknb + b
        dcq_parts.append(dq)
        dckv_parts.append((dk, dv))
    if qk_norm:
        acc(dcqns_ref, dcqns[None, :])
        acc(dcqnb_ref, dcqnb[None, :])
        acc(dckns_ref, dckns[None, :])
        acc(dcknb_ref, dcknb[None, :])
    else:
        acc(dcqns_ref, jnp.zeros(dcqns_ref.shape, f32))
        acc(dcqnb_ref, jnp.zeros(dcqnb_ref.shape, f32))
        acc(dckns_ref, jnp.zeros(dckns_ref.shape, f32))
        acc(dcknb_ref, jnp.zeros(dcknb_ref.shape, f32))
    dcq = jnp.concatenate(dcq_parts, axis=-1).reshape(M, HD)
    dckv = jnp.concatenate(
        [d for d, _ in dckv_parts] + [d for _, d in dckv_parts],
        axis=-1).reshape(NB * Mq, 2 * HD)
    acc(dcwq_ref, _mm(h2, dcq.astype(dt), _TN))
    acc(dcbq_ref, jnp.sum(dcq, axis=0, keepdims=True))
    acc(dcwkv_ref, _mm(mem, dckv.astype(dt), _TN))
    acc(dcbkv_ref, jnp.sum(dckv, axis=0, keepdims=True))
    dmem = _mm(dckv.astype(dt), cwkv_ref[:], _NT)     # (NB*Mq, d) f32
    dmem_ref[:] = dmem.astype(dmem_ref.dtype).reshape(NB, Mq, d)
    dh2 = _mm(dcq.astype(dt), cwq_ref[:], _NT)
    dx1_ln, ds2, db2_ = _ln_bwd32(dh2, xhat2, rstd2, ln2s_ref[0:1, :])
    acc(dln2s_ref, ds2[None, :])
    acc(dln2b_ref, db2_[None, :])
    dx1 = dx2 + dx1_ln

    # self-attn: x1 = x + drop(sattn_c@sWo + sbo)
    dsatt = dx1 if drop_thresh == 0 else dx1 * masks[0]
    acc(dswo_ref, _mm(sattn_c, dsatt.astype(dt), _TN))
    acc(dsbo_ref, jnp.sum(dsatt, axis=0, keepdims=True))
    do3 = _mm(dsatt.astype(dt), swo_ref[:], _NT).reshape(NB, T, HD)
    dq_parts, dk_parts, dv_parts = [], [], []
    dsqns = dsqnb = dskns = dsknb = None
    if packed:
        for gg in range(HD // 128):
            q, res_g, qxh, qrs, kxh, krs = sheads[gg]
            do_g = do3[:, :, gg * 128:(gg + 1) * 128]
            dq, dk, dv = pk.group_attn_bwd(
                do_g, q, res_g, dh=Dh, scale=scale, dt=dt)
            if qk_norm:
                dq, a, b = pk.ln_blocks_bwd32(
                    dq, qxh, qrs, sqns_ref[0:1, :], Dh)
                a, b = a[0], b[0]
                dsqns = a if dsqns is None else dsqns + a
                dsqnb = b if dsqnb is None else dsqnb + b
                dk, a, b = pk.ln_blocks_bwd32(
                    dk, kxh, krs, skns_ref[0:1, :], Dh)
                a, b = a[0], b[0]
                dskns = a if dskns is None else dskns + a
                dsknb = b if dsknb is None else dsknb + b
            dq_parts.append(dq)
            dk_parts.append(dk)
            dv_parts.append(dv)
    for hh in range(H if not packed else 0):
        q, k, v, p, qxh, qrs, kxh, krs = sheads[hh]
        do_h = do3[:, :, hh * Dh:(hh + 1) * Dh].astype(dt)
        dv = _mm(p.astype(dt), do_h, (((1,), (1,)), ((0,), (0,))))
        dp = _mm(do_h, v, (((2,), (2,)), ((0,), (0,))))
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        ds_lp = ds.astype(dt)
        dq = _mm(ds_lp, k, (((2,), (1,)), ((0,), (0,)))) * scale
        dk = _mm(ds_lp, q, (((1,), (1,)), ((0,), (0,)))) * scale
        if qk_norm:
            dq, a, b = _ln_bwd32(dq, qxh, qrs, sqns_ref[0:1, :])
            dsqns = a if dsqns is None else dsqns + a
            dsqnb = b if dsqnb is None else dsqnb + b
            dk, a, b = _ln_bwd32(dk, kxh, krs, skns_ref[0:1, :])
            dskns = a if dskns is None else dskns + a
            dsknb = b if dsknb is None else dsknb + b
        dq_parts.append(dq)
        dk_parts.append(dk)
        dv_parts.append(dv)
    if qk_norm:
        acc(dsqns_ref, dsqns[None, :])
        acc(dsqnb_ref, dsqnb[None, :])
        acc(dskns_ref, dskns[None, :])
        acc(dsknb_ref, dsknb[None, :])
    else:
        acc(dsqns_ref, jnp.zeros(dsqns_ref.shape, f32))
        acc(dsqnb_ref, jnp.zeros(dsqnb_ref.shape, f32))
        acc(dskns_ref, jnp.zeros(dskns_ref.shape, f32))
        acc(dsknb_ref, jnp.zeros(dsknb_ref.shape, f32))
    dqkv = jnp.concatenate(
        dq_parts + dk_parts + dv_parts, axis=-1).reshape(M, 3 * HD)
    acc(dswqkv_ref, _mm(h1, dqkv.astype(dt), _TN))
    acc(dsbqkv_ref, jnp.sum(dqkv, axis=0, keepdims=True))
    dh1 = _mm(dqkv.astype(dt), swqkv_ref[:], _NT)
    dx_ln, ds1, db1_ = _ln_bwd32(dh1, xhat1, rstd1, ln1s_ref[0:1, :])
    acc(dln1s_ref, ds1[None, :])
    acc(dln1b_ref, db1_[None, :])
    dx_ref[:] = (dx1 + dx_ln).astype(dx_ref.dtype).reshape(NB, T, d)


# ---------------------------------------------------------------------------
# wrappers
# ---------------------------------------------------------------------------


def _fwd_nb(B, T, d, dff, H, itemsize, extra_per_batch=0):
    per_batch = (
        8 * T * d * itemsize
        + T * 3 * d * itemsize
        + T * dff * itemsize
        + 2 * T * T * 4
        + extra_per_batch
    )
    nb = max(1, FWD_ACT_VMEM_BUDGET // max(per_batch, 1))
    while nb > 1 and B % nb:
        nb -= 1
    return nb


def _bwd_nb(B, T, d, dff, H, itemsize, packed=False):
    from sketchformer_tpu.ops.pallas_encoder_train import _pad128

    d_p, dff_p, T_p = _pad128(d), _pad128(dff), _pad128(T)
    if packed:
        # packed group layout: unpadded full-lane qkv/grad panes; only
        # dominant persistent panes counted (see the encoder-train twin
        # of this estimate for the round-4 rationale — the per-head
        # padded estimate below halved the h8 grid NB for no VMEM
        # reason; 8,687 -> 9,299 sk/s measured from the fix)
        HD = (d // H) * H
        groups = max(HD // 128, 1)
        per_batch = (
            18 * T * d_p * itemsize
            + 2 * T * 3 * HD * itemsize     # self qkv + dqkv (unpadded)
            + 2 * T * dff_p * itemsize
            + (2 * H + 2) * T * T_p * 4     # self+cross p chunks + live
            + 6 * groups * T * 128 * 4      # self+cross d{q,k,v} panes
            + 3 * T * d_p                   # u8 dropout bits
        )
    else:
        Dh_p = _pad128(d // H)
        per_batch = (
            18 * T * d_p * itemsize
            + 2 * T * 3 * H * Dh_p * itemsize   # self qkv + dqkv
            + 2 * T * dff_p * itemsize
            + (2 * H + 2) * T * T_p * 4     # self+cross stored p + live panes
            + 6 * H * T * Dh_p * 4          # self + cross d{q,k,v} f32 parts
            + 3 * T * d_p                   # u8 dropout bits
        )
    nb = max(1, BWD_ACT_VMEM_BUDGET // max(per_batch, 1))
    if packed:
        # packed-bwd NB cap — see the encoder twin for the measured
        # isolated-vs-full-step story (full step prefers 16)
        nb = min(nb, int(os.environ.get("SK_PACKED_BWD_NB", "16")))
    while nb > 1 and B % nb:
        nb -= 1
    return nb


def _biases(self_key_mask, cross_key_mask):
    if self_key_mask is not None:
        sbias = jnp.where(self_key_mask, 0.0, NEG_INF).astype(
            jnp.float32)[:, None, :]
    else:
        sbias = jnp.zeros((1, 1), jnp.float32)
    if cross_key_mask is not None:
        cbias = jnp.where(cross_key_mask, 0.0, NEG_INF).astype(
            jnp.float32)[:, None, :]
    else:
        cbias = jnp.zeros((1, 1), jnp.float32)
    return sbias, cbias


def _dec_fwd_call(x, mem, sbias, cbias, drop, wlist, *, L, H, Dh,
                  use_smask, use_cmask, qk_norm, drop_thresh, final_ln,
                  collect, drop_impl="bits", packed=False):
    B, T, d = x.shape
    Mq = mem.shape[1]
    dff = wlist[_DWKEYS.index("w1")].shape[2]
    extra = 0
    if collect:
        extra += L * T * d * x.dtype.itemsize     # xins block
    if drop_thresh > 0 and drop_impl == "bits":
        extra += 3 * L * T * d                    # u8 dropout bits
    NB = _fwd_nb(B, T, d, dff, H, x.dtype.itemsize, extra_per_batch=extra)
    spec_x = _specs_x(NB, T, d)
    spec_mem = pl.BlockSpec((NB, Mq, d), lambda g: (g, 0, 0),
                            memory_space=pltpu.VMEM)
    spec_sb = (pl.BlockSpec((NB, 1, T), lambda g: (g, 0, 0),
                            memory_space=pltpu.VMEM)
               if use_smask else _spec_const(sbias.shape))
    spec_cb = (pl.BlockSpec((NB, 1, Mq), lambda g: (g, 0, 0),
                            memory_space=pltpu.VMEM)
               if use_cmask else _spec_const(cbias.shape))
    lnf_s = wlist[-2] if final_ln else jnp.zeros((1, d), jnp.float32)
    lnf_b = wlist[-1] if final_ln else jnp.zeros((1, d), jnp.float32)
    core = list(wlist[:len(_DWKEYS)]) + [lnf_s, lnf_b]
    in_specs = ([spec_x, spec_mem, spec_sb, spec_cb]
                + [_spec_const(a.shape) for a in core])
    operands = [x, mem, sbias, cbias] + core
    if drop_thresh > 0:
        if drop_impl == "prng":
            in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        else:
            in_specs.append(
                pl.BlockSpec((3 * L, NB, T, d), lambda g: (0, g, 0, 0),
                             memory_space=pltpu.VMEM))
        operands.append(drop)
    out_shape = [jax.ShapeDtypeStruct(x.shape, x.dtype)]
    out_specs = [spec_x]
    if collect:
        out_shape.append(jax.ShapeDtypeStruct((L, B, T, d), x.dtype))
        out_specs.append(
            pl.BlockSpec((L, NB, T, d), lambda g: (0, g, 0, 0),
                         memory_space=pltpu.VMEM))
    res = pl.pallas_call(
        functools.partial(
            _dec_stack_kernel, L=L, H=H, Dh=Dh, scale=1.0 / (Dh ** 0.5),
            use_smask=use_smask, use_cmask=use_cmask, qk_norm=qk_norm,
            final_ln=final_ln, collect_inputs=collect,
            drop_thresh=drop_thresh, drop_impl=drop_impl, packed=packed),
        grid=(B // NB,),
        in_specs=in_specs,
        out_specs=tuple(out_specs) if collect else out_specs[0],
        out_shape=tuple(out_shape) if collect else out_shape[0],
        interpret=_use_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
    )(*operands)
    return res if collect else (res, None)


def _dec_layer_bwd(x, mem, g, sbias, cbias, drop, wl, *, H, Dh, scale,
                   use_smask, use_cmask, qk_norm, drop_thresh,
                   drop_impl="bits", layer=0, packed=False):
    B, T, d = x.shape
    Mq = mem.shape[1]
    dff = wl["w1"].shape[1]
    NB = _bwd_nb(B, T, d, dff, H, x.dtype.itemsize, packed=packed)
    spec_x = _specs_x(NB, T, d)
    spec_mem = pl.BlockSpec((NB, Mq, d), lambda g: (g, 0, 0),
                            memory_space=pltpu.VMEM)
    spec_sb = (pl.BlockSpec((NB, 1, T), lambda g: (g, 0, 0),
                            memory_space=pltpu.VMEM)
               if use_smask else _spec_const(sbias.shape))
    spec_cb = (pl.BlockSpec((NB, 1, Mq), lambda g: (g, 0, 0),
                            memory_space=pltpu.VMEM)
               if use_cmask else _spec_const(cbias.shape))
    if drop_thresh > 0 and drop_impl == "prng":
        spec_drop = pl.BlockSpec(memory_space=pltpu.SMEM)  # (1,) seed
    elif drop_thresh > 0:
        spec_drop = pl.BlockSpec((3, NB, T, d), lambda g: (0, g, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        spec_drop = _spec_const(drop.shape)
    warg = [wl[k] for k in _DWKEYS]
    dw_shapes = [jax.ShapeDtypeStruct(a.shape, jnp.float32) for a in warg]
    out_shape = (jax.ShapeDtypeStruct(x.shape, x.dtype),
                 jax.ShapeDtypeStruct(mem.shape, mem.dtype),
                 *dw_shapes)
    out_specs = (spec_x, spec_mem, *[_spec_const(a.shape) for a in warg])
    res = pl.pallas_call(
        functools.partial(
            _dec_layer_bwd_kernel, H=H, Dh=Dh, scale=scale,
            use_smask=use_smask, use_cmask=use_cmask, qk_norm=qk_norm,
            drop_thresh=drop_thresh, drop_impl=drop_impl, layer=layer,
            packed=packed),
        grid=(B // NB,),
        in_specs=[spec_x, spec_mem, spec_x, spec_sb, spec_cb, spec_drop]
        + [_spec_const(a.shape) for a in warg],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_use_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=max(64 * 1024 * 1024,
                                 2 * BWD_ACT_VMEM_BUDGET)),
    )(x, mem, g, sbias, cbias, drop, *warg)
    dx, dmem = res[0], res[1]
    return dx, dmem, {k: v for k, v in zip(_DWKEYS, res[2:])}


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _dec_stack_train(x, mem, sbias, cbias, L, H, Dh, flags, drop, *wlist):
    use_smask, use_cmask, qk_norm, thresh, drop_impl, packed = flags
    y, _ = _dec_fwd_call(x, mem, sbias, cbias, drop, wlist, L=L, H=H,
                         Dh=Dh, use_smask=use_smask, use_cmask=use_cmask,
                         qk_norm=qk_norm, drop_thresh=thresh,
                         final_ln=False, collect=False,
                         drop_impl=drop_impl, packed=packed)
    return y


def _dec_stack_train_fwd(x, mem, sbias, cbias, L, H, Dh, flags, drop,
                         *wlist):
    use_smask, use_cmask, qk_norm, thresh, drop_impl, packed = flags
    y, xins = _dec_fwd_call(x, mem, sbias, cbias, drop, wlist, L=L, H=H,
                            Dh=Dh, use_smask=use_smask,
                            use_cmask=use_cmask, qk_norm=qk_norm,
                            drop_thresh=thresh, final_ln=False,
                            collect=True, drop_impl=drop_impl,
                            packed=packed)
    return y, (xins, mem, sbias, cbias, drop, wlist)


def _dec_stack_train_bwd(L, H, Dh, flags, res, g):
    use_smask, use_cmask, qk_norm, thresh, drop_impl, packed = flags
    xins, mem, sbias, cbias, drop, wlist = res
    scale = 1.0 / (Dh ** 0.5)
    dws = []
    dmem_total = None
    for i in reversed(range(L)):
        wl = {k: _row(a[i]) for k, a in zip(_DWKEYS, wlist)}
        if thresh > 0 and drop_impl == "bits":
            drop_i = drop[3 * i:3 * i + 3]
        else:
            drop_i = drop           # (1,) prng seed, or unused dummy
        g, dmem, dwl = _dec_layer_bwd(
            xins[i], mem, g, sbias, cbias, drop_i, wl, H=H, Dh=Dh,
            scale=scale, use_smask=use_smask, use_cmask=use_cmask,
            qk_norm=qk_norm, drop_thresh=thresh, drop_impl=drop_impl,
            layer=i, packed=packed)
        dmem_total = dmem if dmem_total is None else dmem_total + dmem
        dws.append(dwl)
    dws = dws[::-1]
    dwlist = []
    for k, a in zip(_DWKEYS, wlist):
        stacked = jnp.stack([dw[k] for dw in dws])
        dwlist.append(stacked.reshape(a.shape).astype(a.dtype))
    return (g, dmem_total, None, None, None, *dwlist)


_dec_stack_train.defvjp(_dec_stack_train_fwd, _dec_stack_train_bwd)


def fused_decoder_stack_train(
    x: jnp.ndarray,
    memory: jnp.ndarray,
    self_key_mask: Optional[jnp.ndarray],
    cross_key_mask: Optional[jnp.ndarray],
    w: dict,
    *,
    num_heads: int,
    qk_norm: bool = False,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    dropout_impl: str = "auto",
) -> jnp.ndarray:
    """Differentiable fused decoder stack WITHOUT the final LayerNorm
    (apply ops.pallas_encoder_train.apply_final_ln after).

    ``dropout_impl``: 'bits' = external u8 tensor shared by fwd/bwd;
    'prng' = in-kernel hardware PRNG (TPU only, no HBM bits traffic);
    'auto' = 'prng' on TPU else 'bits' (ops/pallas_dropout.py)."""
    B, T, d = x.shape
    L = w["s_wqkv"].shape[0]
    H = num_heads
    Dh = d // H
    sbias, cbias = _biases(self_key_mask, cross_key_mask)
    thresh = int(round(dropout_rate * 256))
    impl = "bits"
    if thresh > 0:
        if dropout_rng is None:
            raise ValueError("dropout_rate > 0 requires dropout_rng")
        impl = pdrop.resolve_impl(dropout_impl)
        if impl == "prng":
            drop = pdrop.seed_from_rng(dropout_rng)
        else:
            drop = jax.random.bits(dropout_rng, (3 * L, B, T, d),
                                   dtype=jnp.uint8)
    else:
        drop = jnp.zeros((1, 1), jnp.uint8)
    # small-head geometries run PACKED (pallas_packed.py); qk-norm
    # params tile to 128 lanes OUTSIDE the custom VJP so autodiff
    # reduces their grads back to (L, Dh)
    packed = pk.packed_supported(d, H) and T % 8 == 0
    if packed:
        w = {**w, **{k: pk.tile_heads(w[k], 128 // Dh)
                     for k in ("s_qns", "s_qnb", "s_kns", "s_knb",
                               "c_qns", "c_qnb", "c_kns", "c_knb")}}
    wlist = [w[k] for k in _DWKEYS]
    flags = (self_key_mask is not None, cross_key_mask is not None,
             qk_norm, thresh, impl, packed)
    return _dec_stack_train(x, memory, sbias, cbias, L, H, Dh, flags,
                            drop, *wlist)


def fused_decoder_stack(
    x: jnp.ndarray,
    memory: jnp.ndarray,
    self_key_mask: Optional[jnp.ndarray],
    cross_key_mask: Optional[jnp.ndarray],
    w: dict,
    *,
    num_heads: int,
    qk_norm: bool = False,
) -> jnp.ndarray:
    """Forward-only fused decoder stack WITH final LayerNorm (eval loss)."""
    B, T, d = x.shape
    L = w["s_wqkv"].shape[0]
    H = num_heads
    Dh = d // H
    sbias, cbias = _biases(self_key_mask, cross_key_mask)
    drop = jnp.zeros((1, 1), jnp.uint8)
    packed = pk.packed_supported(d, H) and T % 8 == 0
    if packed:
        w = {**w, **{k: pk.tile_heads(w[k], 128 // Dh)
                     for k in ("s_qns", "s_qnb", "s_kns", "s_knb",
                               "c_qns", "c_qnb", "c_kns", "c_knb")}}
    wlist = [w[k] for k in _DWKEYS] + [w["lnfs"], w["lnfb"]]
    y, _ = _dec_fwd_call(
        x, memory, sbias, cbias, drop, wlist, L=L, H=H, Dh=Dh,
        use_smask=self_key_mask is not None,
        use_cmask=cross_key_mask is not None, qk_norm=qk_norm,
        drop_thresh=0, final_ln=True, collect=False, packed=packed)
    return y


def stack_decoder_weights(dec_params: dict, *, num_layers: int,
                          compute_dtype) -> dict:
    """Flax ``params['decoder']`` subtree -> stacked kernel operands."""
    dt = compute_dtype
    f32 = jnp.float32

    def stk(path, dtype):
        out = []
        for i in range(num_layers):
            node = dec_params[f"layer_{i}"]
            for p in path:
                node = node[p]
            out.append(jnp.asarray(node, dtype))
        return jnp.stack(out)

    d = dec_params["layer_0"]["ln1"]["scale"].shape[0]
    s_qkv_k, s_qkv_b, c_kv_k, c_kv_b = [], [], [], []
    for i in range(num_layers):
        sa = dec_params[f"layer_{i}"]["self_attn"]
        s_qkv_k.append(jnp.concatenate(
            [sa[n]["kernel"].reshape(d, -1)
             for n in ("query", "key", "value")], axis=-1))
        s_qkv_b.append(jnp.concatenate(
            [sa[n]["bias"].reshape(-1)
             for n in ("query", "key", "value")], axis=-1))
        ca = dec_params[f"layer_{i}"]["cross_attn"]
        c_kv_k.append(jnp.concatenate(
            [ca[n]["kernel"].reshape(d, -1) for n in ("key", "value")],
            axis=-1))
        c_kv_b.append(jnp.concatenate(
            [ca[n]["bias"].reshape(-1) for n in ("key", "value")],
            axis=-1))
    w = {
        "ln1s": stk(("ln1", "scale"), f32),
        "ln1b": stk(("ln1", "bias"), f32),
        "s_wqkv": jnp.stack(s_qkv_k).astype(dt),
        "s_bqkv": jnp.stack(s_qkv_b).astype(f32),
        "s_wo": stk(("self_attn", "out", "kernel"), dt).reshape(
            num_layers, -1, d),
        "s_bo": stk(("self_attn", "out", "bias"), f32),
        "ln2s": stk(("ln2", "scale"), f32),
        "ln2b": stk(("ln2", "bias"), f32),
        "c_wq": stk(("cross_attn", "query", "kernel"), dt).reshape(
            num_layers, d, -1),
        "c_bq": stk(("cross_attn", "query", "bias"), f32).reshape(
            num_layers, -1),
        "c_wkv": jnp.stack(c_kv_k).astype(dt),
        "c_bkv": jnp.stack(c_kv_b).astype(f32),
        "c_wo": stk(("cross_attn", "out", "kernel"), dt).reshape(
            num_layers, -1, d),
        "c_bo": stk(("cross_attn", "out", "bias"), f32),
        "ln3s": stk(("ln3", "scale"), f32),
        "ln3b": stk(("ln3", "bias"), f32),
        "w1": stk(("ffn", "in", "kernel"), dt),
        "b1": stk(("ffn", "in", "bias"), f32),
        "w2": stk(("ffn", "out", "kernel"), dt),
        "b2": stk(("ffn", "out", "bias"), f32),
    }
    sa0 = dec_params["layer_0"]["self_attn"]
    head_dim = sa0["query"]["kernel"].shape[-1]
    if "q_norm" in sa0:
        w["s_qns"] = stk(("self_attn", "q_norm", "scale"), f32)
        w["s_qnb"] = stk(("self_attn", "q_norm", "bias"), f32)
        w["s_kns"] = stk(("self_attn", "k_norm", "scale"), f32)
        w["s_knb"] = stk(("self_attn", "k_norm", "bias"), f32)
        w["c_qns"] = stk(("cross_attn", "q_norm", "scale"), f32)
        w["c_qnb"] = stk(("cross_attn", "q_norm", "bias"), f32)
        w["c_kns"] = stk(("cross_attn", "k_norm", "scale"), f32)
        w["c_knb"] = stk(("cross_attn", "k_norm", "bias"), f32)
    else:
        for k in ("s_qns", "s_kns", "c_qns", "c_kns"):
            w[k] = jnp.ones((num_layers, head_dim), f32)
        for k in ("s_qnb", "s_knb", "c_qnb", "c_knb"):
            w[k] = jnp.zeros((num_layers, head_dim), f32)
    w["lnfs"] = jnp.asarray(dec_params["ln_out"]["scale"], f32)[None, :]
    w["lnfb"] = jnp.asarray(dec_params["ln_out"]["bias"], f32)[None, :]
    return w
