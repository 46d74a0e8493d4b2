"""Lane-PACKED chunked AR decode for small heads (head_dim < 128).

ops/pallas_decode_loop.py's chunk kernel folds heads into rows
((NB, H*Dh) -> (NB*H, Dh)) — a minor-dim reshape Mosaic rejects below
full lane width ("infer-vector-layout: unsupported shape cast" at
Dh=32 on v5e), which round 3 worked around by gating the reference
geometry (H=8/Dh=32, SURVEY.md §2 "Sketchformer model") to the composed
XLA path: 221 ms p50 vs the flagship's 60.

This kernel keeps heads IN LANES instead. Every pane stays (rows, d)
with d = H*Dh, the k/v caches live head-interleaved as (L, B, Tmax, d),
and per-head attention runs through segment-indicator matmuls (the
ops/pallas_packed.py encoder trick, applied to the decode loop):

  scores[b,t,h]  = sum_l in seg(h) (k[b,t,l] * q[b,l])
                 = ((k * q) @ E)[b,t,h]          E: (d, H) 0/1 indicator
  softmax        = per-head max/exp/sum on the (.., H) pane
  expand back    = probs @ E^T  -> (.., d), exact (0/1 matmul copies
                   bf16 values bit-for-bit into the f32 accumulator)
  context[b,l]   = sum_t probsL[b,t,l] * v[b,t,l]

so the per-step op count is CONSTANT in H (one extra matmul pair per
attention site), no relayout ever happens, and any d_model % num_heads
== 0 geometry is served — not just 128 % Dh == 0. Numerics mirror the
folded kernel op-for-op (bf16 products, f32 accumulation, same masking
and EOS bookkeeping); greedy-token semantics are identical to
infer.decode.make_token_decoder and pinned by tests/test_fast_decode.py
on the interpret path.

Measured v5e (B=64/T=192, d=256, L=8, H=8/Dh=32, bf16): see
docs/PERF_DECODE.md — the point of this kernel is that the reference
head geometry decodes at chunk-kernel speed instead of composed speed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sketchformer_tpu.ops.pallas_decode_loop import (
    CACHE_VMEM_BUDGET,
    NEG_INF,
    _ln_rows,
    _mm,
    _use_interpret,
)

_PACKED_WKEYS = ("ln1s", "ln1b", "s_wqkv", "s_bqkv", "s_qns", "s_qnb",
                 "s_kns", "s_knb", "s_wo", "s_bo",
                 "ln2s", "ln2b", "c_wq", "c_bq", "c_qns", "c_qnb",
                 "c_wo", "c_bo", "ln3s", "ln3b", "w1", "b1", "w2", "b2",
                 "lnfs", "lnfb")


def _indicators(d, H, dt):
    """(E, Et_dt, Et_f32): lane->head 0/1 indicator and its transpose
    (both built from iota — Mosaic rejects an in-kernel i1 transpose)."""
    Dh = d // H
    lane = jax.lax.broadcasted_iota(jnp.int32, (d, H), 0)
    head = jax.lax.broadcasted_iota(jnp.int32, (d, H), 1)
    E = (lane // Dh == head)
    lane_t = jax.lax.broadcasted_iota(jnp.int32, (H, d), 1)
    head_t = jax.lax.broadcasted_iota(jnp.int32, (H, d), 0)
    Et = (lane_t // Dh == head_t)
    return (E.astype(dt), Et.astype(dt), Et.astype(jnp.float32))


def _seg_ln(x, s_row, b_row, E_f32, Et_f32, Dh):
    """Per-head LayerNorm over each Dh-lane segment of ``x`` (NB, d) —
    the packed form of the folded kernel's qk-norm `_ln_rows` on
    (G, Dh) panes. ``s_row``/``b_row`` are the (1, d) head-tiled
    params."""
    x32 = x.astype(jnp.float32)
    mu = _mm(x32, E_f32) * (1.0 / Dh)              # (NB, H)
    sq = _mm(x32 * x32, E_f32) * (1.0 / Dh)
    var = jnp.maximum(sq - mu * mu, 0.0)
    mu_l = _mm(mu, Et_f32)                          # (NB, d)
    var_l = _mm(var, Et_f32)
    y = (x32 - mu_l) * jax.lax.rsqrt(var_l + 1e-6)
    return y * s_row + b_row


def _packed_trunk_and_ln(x, j, t0, r, *, L, H, qk_norm, dt):
    """One decode position through the L-layer decoder trunk + final
    LayerNorm, heads packed in lanes. Mirrors
    pallas_decode_loop._trunk_and_ln op-for-op except that per-head
    score/softmax runs on (.., H) panes via the indicator matmuls."""
    NB, d = x.shape
    Dh = d // H
    f32 = jnp.float32
    scale = 1.0 / (Dh ** 0.5)
    Tmax = r["kc_hbm"].shape[2]
    K = r["kn"].shape[1]
    E, Et, Et32 = _indicators(d, H, dt)
    E32 = E.astype(f32)
    rows = r["rows"]
    TC = min(128, Tmax)
    assert Tmax % TC == 0, f"Tmax={Tmax} must be a multiple of {TC}"
    NC = Tmax // TC
    nvalid = (t0 + TC - 1) // TC
    tpos3 = jax.lax.broadcasted_iota(jnp.int32, (NB, TC, H), 1)
    chpos3 = jax.lax.broadcasted_iota(jnp.int32, (K, NB, H), 0)

    def kv_copy_tile(i, slot, c):
        tsl = pl.dslice(c * TC, TC)
        return (pltpu.make_async_copy(r["kc_hbm"].at[i, rows, tsl],
                                      r["kbuf"].at[slot, :, tsl],
                                      r["ksem"].at[slot]),
                pltpu.make_async_copy(r["vc_hbm"].at[i, rows, tsl],
                                      r["vbuf"].at[slot, :, tsl],
                                      r["vsem"].at[slot]))

    def kv_start(i, slot):
        for c in range(NC):
            @pl.when(c * TC < t0)
            def _():
                for cp in kv_copy_tile(i, slot, c):
                    cp.start()

    def kv_wait(i, slot):
        for c in range(NC):
            @pl.when(c * TC < t0)
            def _():
                for cp in kv_copy_tile(i, slot, c):
                    cp.wait()

    kv_start(0, 0)

    for i in range(L):
        # ---- cached causal self-attention (single position) -------------
        h = _ln_rows(x, r["ln1s"][i:i + 1, :], r["ln1b"][i:i + 1, :]
                     ).astype(dt)
        qkv = _mm(h, r["swqkv"][i]) + r["sbqkv"][i:i + 1, :]
        q = qkv[:, :d]
        kn = qkv[:, d:2 * d]
        vn = qkv[:, 2 * d:]
        if qk_norm:
            q = _seg_ln(q, r["sqns"][i:i + 1, :], r["sqnb"][i:i + 1, :],
                        E32, Et32, Dh)
            kn = _seg_ln(kn, r["skns"][i:i + 1, :], r["sknb"][i:i + 1, :],
                         E32, Et32, Dh)
        r["kn"][i, pl.dslice(j, 1)] = kn.astype(r["kn"].dtype)[None]
        r["vn"][i, pl.dslice(j, 1)] = vn.astype(r["vn"].dtype)[None]
        if i + 1 < L:
            kv_start(i + 1, (i + 1) % 2)
        kv_wait(i, i % 2)
        qdt = q[None, :, :].astype(dt)               # (1, NB, d)

        def tile_body(c, acc):
            m_a, d_a, ctx_a = acc
            tsl = pl.dslice(c * TC, TC)
            kc = r["kbuf"][i % 2, :, tsl]            # (NB, TC, d) dt
            vc = r["vbuf"][i % 2, :, tsl]
            prod = kc * q[:, None, :].astype(dt)     # (NB, TC, d) dt
            s3 = _mm(prod.reshape(NB * TC, d), E).reshape(
                NB, TC, H) * scale                   # (NB, TC, H) f32
            s3 = jnp.where(tpos3 + c * TC < t0, s3, NEG_INF)
            m_n = jnp.maximum(m_a, jnp.max(s3, axis=1))      # (NB, H)
            corr = jnp.exp(m_a - m_n)
            e_t = jnp.exp(s3 - m_n[:, None, :])      # (NB, TC, H) f32
            pl_ = _mm(e_t.reshape(NB * TC, H).astype(dt), Et).reshape(
                NB, TC, d).astype(dt)                # exact dt replication
            corr_l = _mm(corr, Et32)                 # (NB, d) f32, exact
            ctx_n = ctx_a * corr_l + jnp.sum(pl_ * vc, axis=1, dtype=f32)
            d_n = d_a * corr + jnp.sum(e_t, axis=1)  # (NB, H)
            return m_n, d_n, ctx_n

        m_a, d_a, ctx_a = jax.lax.fori_loop(
            0, nvalid, tile_body,
            (jnp.full((NB, H), NEG_INF, f32), jnp.zeros((NB, H), f32),
             jnp.zeros((NB, d), f32)))
        # ... and this chunk's rows [0, j] (row j = this position's key)
        kch = r["kn"][i]                             # (K, NB, d)
        vch = r["vn"][i]
        prod = kch.astype(dt) * qdt                  # (K, NB, d) dt
        sc = _mm(prod.reshape(K * NB, d), E).reshape(
            K, NB, H) * scale                        # (K, NB, H) f32
        sc = jnp.where(chpos3 <= j, sc, NEG_INF)
        m = jnp.maximum(m_a, jnp.max(sc, axis=0))    # (NB, H)
        corr = jnp.exp(m_a - m)
        ec = jnp.exp(sc - m[None, :, :])             # (K, NB, H)
        denom = d_a * corr + jnp.sum(ec, axis=0)     # (NB, H)
        pc = _mm(ec.reshape(K * NB, H).astype(dt), Et).reshape(
            K, NB, d).astype(dt)
        corr_l = _mm(corr, Et32)
        ctx = (ctx_a * corr_l
               + jnp.sum(pc * vch.astype(dt), axis=0, dtype=f32))
        denom_l = _mm(denom, Et32)                   # (NB, d) f32, exact
        o = ctx / denom_l
        attn = _mm(o.astype(dt), r["swo"][i]) + r["sbo"][i:i + 1, :]
        x = x + attn.astype(dt)
        # ---- cross-attention (precomputed packed memory KV) --------------
        h = _ln_rows(x, r["ln2s"][i:i + 1, :], r["ln2b"][i:i + 1, :]
                     ).astype(dt)
        cq = _mm(h, r["cwq"][i]) + r["cbq"][i:i + 1, :]
        if qk_norm:
            cq = _seg_ln(cq, r["cqns"][i:i + 1, :], r["cqnb"][i:i + 1, :],
                         E32, Et32, Dh)
        ck = r["ck"][i]                              # (NB, Mq, d) dt
        cv = r["cv"][i]
        Mq = ck.shape[1]
        prod = ck * cq[:, None, :].astype(dt)        # (NB, Mq, d) dt
        s3 = _mm(prod.reshape(NB * Mq, d), E).reshape(
            NB, Mq, H) * scale                       # (NB, Mq, H) f32
        m = jnp.max(s3, axis=1, keepdims=True)       # (NB, 1, H)
        e = jnp.exp(s3 - m)
        p3 = e / jnp.sum(e, axis=1, keepdims=True)   # (NB, Mq, H) f32
        pl_ = _mm(p3.reshape(NB * Mq, H).astype(dt), Et).reshape(
            NB, Mq, d).astype(dt)
        o = jnp.sum(pl_ * cv, axis=1, dtype=f32)     # (NB, d)
        cattn = _mm(o.astype(dt), r["cwo"][i]) + r["cbo"][i:i + 1, :]
        x = x + cattn.astype(dt)
        # ---- FFN ---------------------------------------------------------
        h = _ln_rows(x, r["ln3s"][i:i + 1, :], r["ln3b"][i:i + 1, :]
                     ).astype(dt)
        h = _mm(h, r["w1"][i]) + r["b1"][i:i + 1, :]
        h = jnp.maximum(h, 0).astype(dt)
        h = _mm(h, r["w2"][i]) + r["b2"][i:i + 1, :]
        x = x + h.astype(dt)

    return _ln_rows(x, r["lnfs"][0:1, :], r["lnfb"][0:1, :]).astype(dt)


def _packed_loop_kernel(
    t_ref,                       # scalar prefetch: (1,) int32 chunk start
    prev_ref, fin_ref, kc_ref, vc_ref, ck_ref, cv_ref,
    emb_ref, pos_ref, hw_ref, hb_ref,
    ln1s_ref, ln1b_ref, swqkv_ref, sbqkv_ref,
    sqns_ref, sqnb_ref, skns_ref, sknb_ref, swo_ref, sbo_ref,
    ln2s_ref, ln2b_ref, cwq_ref, cbq_ref,
    cqns_ref, cqnb_ref, cwo_ref, cbo_ref,
    ln3s_ref, ln3b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
    lnfs_ref, lnfb_ref,
    ids_ref, finout_ref, kn_ref, vn_ref,
    kbuf_ref, vbuf_ref, ksem, vsem, *,
    K, L, H, qk_norm, pad_id, sos_id, eos_id,
):
    """Token chunk kernel, packed-head layout. Embed/head/argmax/EOS
    tail is identical to pallas_decode_loop._loop_kernel (exact-id
    contract); only the trunk's attention layout differs."""
    t0 = t_ref[0]
    NB = prev_ref.shape[0]
    V, d = emb_ref.shape
    dt = emb_ref.dtype
    f32 = jnp.float32
    sqrt_d = jnp.asarray(d ** 0.5, dt)

    vlane = jax.lax.broadcasted_iota(jnp.int32, (NB, V), 1)
    kiota = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)

    trunk_refs = dict(
        kc_hbm=kc_ref, vc_hbm=vc_ref, kbuf=kbuf_ref, vbuf=vbuf_ref,
        ksem=ksem, vsem=vsem,
        rows=pl.dslice(pl.program_id(0) * NB, NB),
        ck=ck_ref, cv=cv_ref, kn=kn_ref, vn=vn_ref,
        ln1s=ln1s_ref, ln1b=ln1b_ref, swqkv=swqkv_ref, sbqkv=sbqkv_ref,
        sqns=sqns_ref, sqnb=sqnb_ref, skns=skns_ref, sknb=sknb_ref,
        swo=swo_ref, sbo=sbo_ref, ln2s=ln2s_ref, ln2b=ln2b_ref,
        cwq=cwq_ref, cbq=cbq_ref, cqns=cqns_ref, cqnb=cqnb_ref,
        cwo=cwo_ref, cbo=cbo_ref, ln3s=ln3s_ref, ln3b=ln3b_ref,
        w1=w1_ref, b1=b1_ref, w2=w2_ref, b2=b2_ref,
        lnfs=lnfs_ref, lnfb=lnfb_ref)

    def body(j, carry):
        prev, finished, ids = carry
        onehot = (vlane == prev).astype(dt)              # (NB, V)
        x = _mm(onehot, emb_ref[:]).astype(dt) * sqrt_d  # (NB, d) dt
        posrow = jnp.sum(
            jnp.where(kiota == j, pos_ref[:].astype(f32), 0.0),
            axis=0, keepdims=True)
        x = x + posrow.astype(dt)

        h = _packed_trunk_and_ln(x, j, t0, trunk_refs, L=L, H=H,
                                 qk_norm=qk_norm, dt=dt)
        logits = _mm(h, hw_ref[:]).astype(dt).astype(f32) \
            + hb_ref[0:1, :]                             # (NB, V) f32
        mx = jnp.max(logits, axis=1, keepdims=True)
        nxt = jnp.min(jnp.where(logits >= mx, vlane, V),
                      axis=1, keepdims=True)
        nxt = jnp.where(finished != 0, pad_id, nxt)
        finished = jnp.where(nxt == eos_id, 1, finished)
        ids = jnp.where(klane == j, nxt, ids)
        return nxt, finished, ids

    kn_ref[:] = jnp.zeros_like(kn_ref)
    vn_ref[:] = jnp.zeros_like(vn_ref)
    klane = jax.lax.broadcasted_iota(jnp.int32, (NB, K), 1)
    prev, fin, ids = jax.lax.fori_loop(
        0, K, lambda j, c: body(j, c),
        (prev_ref[:], fin_ref[:], jnp.zeros((NB, K), jnp.int32)))
    ids_ref[:] = ids
    finout_ref[:] = fin


def _packed_cont_loop_kernel(
    t_ref,                       # scalar prefetch: (1,) int32 chunk start
    prev_ref, fin_ref, kc_ref, vc_ref, ck_ref, cv_ref,
    inw_ref, inb_ref, pos_ref, mhw_ref, mhb_ref,
    ln1s_ref, ln1b_ref, swqkv_ref, sbqkv_ref,
    sqns_ref, sqnb_ref, skns_ref, sknb_ref, swo_ref, sbo_ref,
    ln2s_ref, ln2b_ref, cwq_ref, cbq_ref,
    cqns_ref, cqnb_ref, cwo_ref, cbo_ref,
    ln3s_ref, ln3b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
    lnfs_ref, lnfb_ref,
    xy_ref, pen_ref, valid_ref, finout_ref, kn_ref, vn_ref,
    kbuf_ref, vbuf_ref, ksem, vsem, *,
    K, L, H, qk_norm, M, pen_end,
):
    """Continuous (MDN) greedy chunk, packed-head layout. The MDN head
    + greedy component/pen tail is identical to
    pallas_decode_loop._cont_loop_kernel (it never touches head
    geometry); only the trunk's attention layout differs."""
    t0 = t_ref[0]
    NB = prev_ref.shape[0]
    d = inw_ref.shape[1]
    P = 6 * M + 3
    dt = inw_ref.dtype
    f32 = jnp.float32
    sqrt_d = jnp.asarray(d ** 0.5, dt)

    plane = jax.lax.broadcasted_iota(jnp.int32, (NB, P), 1)
    c5 = jax.lax.broadcasted_iota(jnp.int32, (NB, 5), 1)
    kiota = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)

    trunk_refs = dict(
        kc_hbm=kc_ref, vc_hbm=vc_ref, kbuf=kbuf_ref, vbuf=vbuf_ref,
        ksem=ksem, vsem=vsem,
        rows=pl.dslice(pl.program_id(0) * NB, NB),
        ck=ck_ref, cv=cv_ref, kn=kn_ref, vn=vn_ref,
        ln1s=ln1s_ref, ln1b=ln1b_ref, swqkv=swqkv_ref, sbqkv=sbqkv_ref,
        sqns=sqns_ref, sqnb=sqnb_ref, skns=skns_ref, sknb=sknb_ref,
        swo=swo_ref, sbo=sbo_ref, ln2s=ln2s_ref, ln2b=ln2b_ref,
        cwq=cwq_ref, cbq=cbq_ref, cqns=cqns_ref, cqnb=cqnb_ref,
        cwo=cwo_ref, cbo=cbo_ref, ln3s=ln3s_ref, ln3b=ln3b_ref,
        w1=w1_ref, b1=b1_ref, w2=w2_ref, b2=b2_ref,
        lnfs=lnfs_ref, lnfb=lnfb_ref)

    def argmax_lanes(vals, lanes, lo, hi):
        win = (lanes >= lo) & (lanes < hi)
        v = jnp.where(win, vals, NEG_INF)
        mx = jnp.max(v, axis=1, keepdims=True)
        return jnp.min(jnp.where(v >= mx, lanes, hi),
                       axis=1, keepdims=True) - lo      # (NB, 1)

    def body(j, carry):
        prev, finished, xy_acc, pen_acc, valid_acc = carry
        x = _mm(prev.astype(dt), inw_ref[:]).astype(dt) \
            + inb_ref[0:1, :].astype(dt)
        posrow = jnp.sum(
            jnp.where(kiota == j, pos_ref[:].astype(f32), 0.0),
            axis=0, keepdims=True)
        x = x * sqrt_d + posrow.astype(dt)

        h = _packed_trunk_and_ln(x, j, t0, trunk_refs, L=L, H=H,
                                 qk_norm=qk_norm, dt=dt)
        raw = (_mm(h, mhw_ref[:]).astype(dt)
               + mhb_ref[0:1, :].astype(dt)).astype(f32)   # (NB, P)
        comp = argmax_lanes(raw, plane, 0, M)
        pen = argmax_lanes(raw, plane, 6 * M, 6 * M + 3)
        mu_x = jnp.sum(jnp.where(plane == M + comp, raw, 0.0),
                       axis=1, keepdims=True)
        mu_y = jnp.sum(jnp.where(plane == 2 * M + comp, raw, 0.0),
                       axis=1, keepdims=True)
        fin_b = finished != 0
        pen = jnp.where(fin_b, pen_end, pen)
        mu_x = jnp.where(fin_b, 0.0, mu_x)
        mu_y = jnp.where(fin_b, 0.0, mu_y)
        valid = jnp.logical_not(fin_b).astype(jnp.int32)
        finished = jnp.where(pen == pen_end, 1, finished)
        xy_acc = jnp.where(
            klane[:, :, None] == j,
            jnp.concatenate([mu_x, mu_y], axis=1)[:, None, :], xy_acc)
        pen_acc = jnp.where(klane == j, pen, pen_acc)
        valid_acc = jnp.where(klane == j, valid, valid_acc)
        nxt = jnp.where(
            c5 == 0, mu_x,
            jnp.where(c5 == 1, mu_y, (c5 - 2 == pen).astype(f32)))
        return nxt, finished, xy_acc, pen_acc, valid_acc

    kn_ref[:] = jnp.zeros_like(kn_ref)
    vn_ref[:] = jnp.zeros_like(vn_ref)
    klane = jax.lax.broadcasted_iota(jnp.int32, (NB, K), 1)
    prev, fin, xy, pen, valid = jax.lax.fori_loop(
        0, K, lambda j, c: body(j, c),
        (prev_ref[:], fin_ref[:],
         jnp.zeros((NB, K, 2), jnp.float32),
         jnp.zeros((NB, K), jnp.int32),
         jnp.zeros((NB, K), jnp.int32)))
    xy_ref[:] = xy
    pen_ref[:] = pen
    valid_ref[:] = valid
    finout_ref[:] = fin


def _nb_packed(B, Tmax, d, itemsize):
    # packed stream buffers are (2 slots x k+v x (NB, Tmax, d-lanes)):
    # per batch row the packed layout costs H*Dh = d lanes instead of
    # the folded layout's H*max(Dh,128) — 4x less VMEM at Dh=32
    lanes = ((d + 127) // 128) * 128
    per_batch = 4 * Tmax * lanes * itemsize
    nb = max(1, CACHE_VMEM_BUDGET // max(per_batch, 1))
    while nb > 1 and B % nb:
        nb -= 1
    return nb


def stack_packed_qk_norms(w: dict, num_heads: int) -> dict:
    """Head-tile the (L, Dh) qk-norm params to (L, d) lane vectors for
    the packed kernel (LN params are shared across heads in the flax
    model, so tiling is exact)."""
    out = dict(w)
    for k in ("s_qns", "s_qnb", "s_kns", "s_knb",
              "c_qns", "c_qnb", "c_kns", "c_knb"):
        out[k] = jnp.tile(w[k], (1, num_heads))
    return out


def precompute_cross_kv_packed(memory: jnp.ndarray, w: dict, *,
                               num_heads: int, qk_norm: bool = False):
    """(B, Mq, d) bottleneck memory -> PACKED (L, B, Mq, d) cross K/V
    (heads interleaved in lanes, K already qk-normed). The packed
    layout needs no head transpose at all — (B, Mq, H, Dh) is already
    lane-contiguous."""
    L = w["c_wkv"].shape[0]
    B, Mq, d = memory.shape
    HD = w["c_wkv"].shape[2] // 2
    H = num_heads
    Dh = HD // H
    ks, vs = [], []
    for i in range(L):
        kv = (memory.reshape(B * Mq, d) @ w["c_wkv"][i]
              + w["c_bkv"][i].astype(memory.dtype)).reshape(B, Mq, 2 * HD)
        k = kv[..., :HD]
        v = kv[..., HD:]
        if qk_norm:
            # per-head stats; scale/bias applied in flat lane space (the
            # w dict carries the stack_packed_qk_norms head-TILED (d,)
            # params — exact, since the flax params are head-shared)
            k4 = k.reshape(B, Mq, H, Dh).astype(jnp.float32)
            mu = k4.mean(-1, keepdims=True)
            var = jnp.maximum((k4 * k4).mean(-1, keepdims=True)
                              - mu * mu, 0.0)
            k4 = (k4 - mu) * jax.lax.rsqrt(var + 1e-6)
            k = (k4.reshape(B, Mq, HD) * w["c_kns"][i]
                 + w["c_knb"][i]).astype(kv.dtype)
        ks.append(k)
        vs.append(v)
    return jnp.stack(ks), jnp.stack(vs)


def fused_decode_chunk_packed(
    prev: jnp.ndarray,       # (B, 1) int32 last emitted token (SOS first)
    finished: jnp.ndarray,   # (B, 1) int32 0/1 finished rows
    k_cache: jnp.ndarray,    # (L, B, Tmax, d) PACKED post-qk-norm keys
    v_cache: jnp.ndarray,    # (L, B, Tmax, d)
    cross_k: jnp.ndarray,    # (L, B, Mq, d) packed (qk-normed)
    cross_v: jnp.ndarray,    # (L, B, Mq, d)
    emb: jnp.ndarray,        # (V, d) token embedding, compute dtype
    pos_chunk: jnp.ndarray,  # (K, d) positional rows t..t+K-1
    head_w: jnp.ndarray,     # (d, V) vocab head kernel, compute dtype
    head_b: jnp.ndarray,     # (V,) f32 vocab head bias
    w: dict,                 # stack_decoder_weights + stack_packed_qk_norms
    t: jnp.ndarray,          # scalar int32 chunk start (= valid cache rows)
    *,
    num_heads: int,
    qk_norm: bool = False,
    pad_id: int = 0,
    sos_id: int = 1,
    eos_id: int = 2,
):
    """K greedy decode steps per pallas call, packed-head caches.

    Returns (ids, finished, k_new, v_new) with k/v_new as
    (L, B, K, d) — scatter with one donated ``dynamic_update_slice``."""
    B = prev.shape[0]
    L, _, Tmax, d = k_cache.shape
    K = pos_chunk.shape[0]
    V = emb.shape[0]
    Mq = cross_k.shape[2]
    NB = _nb_packed(B, Tmax, d, k_cache.dtype.itemsize)

    spec_row = pl.BlockSpec((NB, 1), lambda g, *_: (g, 0),
                            memory_space=pltpu.VMEM)
    spec_cache = pl.BlockSpec(memory_space=pl.ANY)   # HBM, streamed
    spec_ckv = pl.BlockSpec((L, NB, Mq, d), lambda g, *_: (0, g, 0, 0),
                            memory_space=pltpu.VMEM)
    spec_new = pl.BlockSpec((L, K, NB, d), lambda g, *_: (0, 0, g, 0),
                            memory_space=pltpu.VMEM)
    spec_ids = pl.BlockSpec((NB, K), lambda g, *_: (g, 0),
                            memory_space=pltpu.VMEM)

    def wspec(a):
        zeros = (0,) * a.ndim
        return pl.BlockSpec(a.shape, lambda g, *_a, _z=zeros: _z,
                            memory_space=pltpu.VMEM)

    wargs = [w[k] for k in _PACKED_WKEYS]
    lane = jnp.arange(V)
    hb_masked = jnp.where((lane == pad_id) | (lane == sos_id),
                          head_b + NEG_INF, head_b)
    consts = [emb, pos_chunk, head_w, hb_masked.reshape(1, -1)]
    scratch = [
        pltpu.VMEM((2, NB, Tmax, d), k_cache.dtype),
        pltpu.VMEM((2, NB, Tmax, d), v_cache.dtype),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // NB,),
        in_specs=[spec_row, spec_row, spec_cache, spec_cache,
                  spec_ckv, spec_ckv]
        + [wspec(a) for a in consts] + [wspec(a) for a in wargs],
        out_specs=(spec_ids, spec_row, spec_new, spec_new),
        scratch_shapes=scratch,
    )
    dff = w["w1"].shape[2]
    ids, fin, kn, vn = pl.pallas_call(
        functools.partial(
            _packed_loop_kernel, K=K, L=L, H=num_heads, qk_norm=qk_norm,
            pad_id=pad_id, sos_id=sos_id, eos_id=eos_id),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, K), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((L, K, B, d), k_cache.dtype),
            jax.ShapeDtypeStruct((L, K, B, d), v_cache.dtype),
        ),
        interpret=_use_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * K * (L * (6 * d * d + 2 * d * dff) + 2 * d * V),
            bytes_accessed=(k_cache.size + v_cache.size)
            * k_cache.dtype.itemsize
            + (emb.size + head_w.size) * emb.dtype.itemsize,
            transcendentals=B * num_heads * L * K * Tmax,
        ),
    )(jnp.reshape(t.astype(jnp.int32), (1,)), prev, finished,
      k_cache, v_cache, cross_k, cross_v, *consts, *wargs)
    # (L, K, B, d) -> the cache scatter layout (L, B, K, d)
    return ids, fin, jnp.swapaxes(kn, 1, 2), jnp.swapaxes(vn, 1, 2)


def fused_decode_cont_chunk_packed(
    prev_row: jnp.ndarray,   # (B, 5) f32 last stroke row (SOS row first)
    finished: jnp.ndarray,   # (B, 1) int32
    k_cache: jnp.ndarray,    # (L, B, Tmax, d) PACKED
    v_cache: jnp.ndarray,
    cross_k: jnp.ndarray,    # (L, B, Mq, d) packed
    cross_v: jnp.ndarray,
    in_w: jnp.ndarray,       # (5, d) ContinuousEmbed proj kernel, dt
    in_b: jnp.ndarray,       # (d,) f32 proj bias
    pos_chunk: jnp.ndarray,  # (K, d) positional rows t..t+K-1
    head_w: jnp.ndarray,     # (d, 6M+3) MDN head kernel, dt
    head_b: jnp.ndarray,     # (6M+3,) f32 MDN head bias
    w: dict,                 # stack_decoder_weights + stack_packed_qk_norms
    t: jnp.ndarray,
    *,
    num_heads: int,
    num_mixtures: int,
    qk_norm: bool = False,
    pen_end: int = 2,
):
    """K greedy MDN decode steps per pallas call, packed-head caches.
    Semantics of infer.decode._decode_cont_from_memory greedy; returns
    (xy, pen, valid, finished, k_new (L, B, K, d), v_new)."""
    B = prev_row.shape[0]
    L, _, Tmax, d = k_cache.shape
    K = pos_chunk.shape[0]
    Mq = cross_k.shape[2]
    NB = _nb_packed(B, Tmax, d, k_cache.dtype.itemsize)

    def rowspec(width):
        return pl.BlockSpec((NB, width), lambda g, *_: (g, 0),
                            memory_space=pltpu.VMEM)

    spec_cache = pl.BlockSpec(memory_space=pl.ANY)   # HBM, streamed
    spec_ckv = pl.BlockSpec((L, NB, Mq, d), lambda g, *_: (0, g, 0, 0),
                            memory_space=pltpu.VMEM)
    spec_new = pl.BlockSpec((L, K, NB, d), lambda g, *_: (0, 0, g, 0),
                            memory_space=pltpu.VMEM)
    spec_xy = pl.BlockSpec((NB, K, 2), lambda g, *_: (g, 0, 0),
                           memory_space=pltpu.VMEM)

    def wspec(a):
        zeros = (0,) * a.ndim
        return pl.BlockSpec(a.shape, lambda g, *_a, _z=zeros: _z,
                            memory_space=pltpu.VMEM)

    wargs = [w[k] for k in _PACKED_WKEYS]
    consts = [in_w, in_b.reshape(1, -1), pos_chunk, head_w,
              head_b.reshape(1, -1)]
    scratch = [
        pltpu.VMEM((2, NB, Tmax, d), k_cache.dtype),
        pltpu.VMEM((2, NB, Tmax, d), v_cache.dtype),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // NB,),
        in_specs=[rowspec(5), rowspec(1), spec_cache, spec_cache,
                  spec_ckv, spec_ckv]
        + [wspec(a) for a in consts] + [wspec(a) for a in wargs],
        out_specs=(spec_xy, rowspec(K), rowspec(K), rowspec(1),
                   spec_new, spec_new),
        scratch_shapes=scratch,
    )
    xy, pen, valid, fin, kn, vn = pl.pallas_call(
        functools.partial(
            _packed_cont_loop_kernel, K=K, L=L, H=num_heads,
            qk_norm=qk_norm, M=num_mixtures, pen_end=pen_end),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, K, 2), jnp.float32),
            jax.ShapeDtypeStruct((B, K), jnp.int32),
            jax.ShapeDtypeStruct((B, K), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((L, K, B, d), k_cache.dtype),
            jax.ShapeDtypeStruct((L, K, B, d), v_cache.dtype),
        ),
        interpret=_use_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(jnp.reshape(t.astype(jnp.int32), (1,)), prev_row, finished,
      k_cache, v_cache, cross_k, cross_v, *consts, *wargs)
    return (xy, pen, valid, fin,
            jnp.swapaxes(kn, 1, 2), jnp.swapaxes(vn, 1, 2))
