"""Locate the token-decode overhead vs the MDN decode (60 vs 39 ms p50).

Times a fixed 12-chunk (192-step) decode at B=64 flagship with pieces of
the chunk kernel's per-step tail disabled, by monkeypatching variant
kernels over ops.pallas_decode_loop._loop_kernel:

  full        product kernel
  fold_mask   PAD/SOS logit mask folded into the head bias (no in-kernel
              vlane compare + where pass)
  no_argmax   head matmul runs; nxt = prev (skip mask/max/min passes)
  no_head     skip head matmul + argmax entirely (nxt = prev)
  no_embed    skip one-hot + embedding matmul (constant input row)
  trunk_only  no_embed + no_head (pure trunk cost = cont-mode floor)

Usage: python tools/probe_decode_parts.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

import sketchformer_tpu.ops.pallas_decode_loop as dl
from sketchformer_tpu.models import Sketchformer, SketchformerConfig
from sketchformer_tpu.models.embeddings import sinusoidal_position_encoding
from sketchformer_tpu.ops.pallas_decode_stack import precompute_cross_kv
from sketchformer_tpu.ops.pallas_decoder_train import stack_decoder_weights

B, T, K = 64, 192, 16
NEG_INF = dl.NEG_INF


def make_trunk(skip_self=False, skip_cross=False, skip_ffn=False,
               no_qknorm=False, skip_dma=False, dma_only=False,
               depth=2, one_copy=False):
    def trunk(x, j, t0, r, *, L, H, Dh, qk_norm, dt):
        NB, d = x.shape
        G = NB * H
        HD = H * Dh
        f32 = jnp.float32
        scale = 1.0 / (Dh ** 0.5)
        Tmax = r["kbuf"].shape[2]
        K = r["kn"].shape[1]
        chpos = jax.lax.broadcasted_iota(jnp.int32, (G, K), 1)
        rows = r["rows"]
        TC = min(128, Tmax)
        NC = Tmax // TC
        nvalid = (t0 + TC - 1) // TC
        tpos = jax.lax.broadcasted_iota(jnp.int32, (G, TC), 1)
        if no_qknorm:
            qk_norm = False

        def kv_copy_tile(i, slot, c):
            tsl = pl.dslice(c * TC, TC)
            return (dl.pltpu.make_async_copy(r["kc_hbm"].at[i, rows, tsl],
                                             r["kbuf"].at[slot, :, tsl],
                                             r["ksem"].at[slot]),
                    dl.pltpu.make_async_copy(r["vc_hbm"].at[i, rows, tsl],
                                             r["vbuf"].at[slot, :, tsl],
                                             r["vsem"].at[slot]))

        def kv_whole(i, slot, nt):
            tsl = pl.dslice(0, nt * TC)
            return (dl.pltpu.make_async_copy(r["kc_hbm"].at[i, rows, tsl],
                                             r["kbuf"].at[slot, :, tsl],
                                             r["ksem"].at[slot]),
                    dl.pltpu.make_async_copy(r["vc_hbm"].at[i, rows, tsl],
                                             r["vbuf"].at[slot, :, tsl],
                                             r["vsem"].at[slot]))

        def kv_start(i, slot):
            if skip_dma or skip_self:
                return
            if one_copy:
                # one copy per (layer, k/v): size picked by scalar branch
                for nt in range(1, NC + 1):
                    lo = (nt - 1) * TC
                    @pl.when((lo < t0) & (t0 <= nt * TC))
                    def _():
                        for cp in kv_whole(i, slot, nt):
                            cp.start()
                return
            for c in range(NC):
                @pl.when(c * TC < t0)
                def _():
                    for cp in kv_copy_tile(i, slot, c):
                        cp.start()

        def kv_wait(i, slot):
            if skip_dma or skip_self:
                return
            if one_copy:
                for nt in range(1, NC + 1):
                    lo = (nt - 1) * TC
                    @pl.when((lo < t0) & (t0 <= nt * TC))
                    def _():
                        for cp in kv_whole(i, slot, nt):
                            cp.wait()
                return
            for c in range(NC):
                @pl.when(c * TC < t0)
                def _():
                    for cp in kv_copy_tile(i, slot, c):
                        cp.wait()

        nslots = r["kbuf"].shape[0]
        for ii in range(min(depth, L)):
            kv_start(ii, ii % nslots)

        def fold(pane):
            return pane.reshape(G, Dh)

        def unfold(pane):
            return pane.reshape(NB, HD)

        for i in range(L):
            if not skip_self:
                h = dl._ln_rows(x, r["ln1s"][i:i + 1, :],
                                r["ln1b"][i:i + 1, :]).astype(dt)
                qkv = dl._mm(h, r["swqkv"][i]) + r["sbqkv"][i:i + 1, :]
                q = fold(qkv[:, :HD])
                kn = fold(qkv[:, HD:2 * HD])
                vn = fold(qkv[:, 2 * HD:])
                if qk_norm:
                    q = dl._ln_rows(q, r["sqns"][i:i + 1, :],
                                    r["sqnb"][i:i + 1, :])
                    kn = dl._ln_rows(kn, r["skns"][i:i + 1, :],
                                     r["sknb"][i:i + 1, :])
                r["kn"][i, pl.dslice(j, 1)] = kn.astype(r["kn"].dtype)[None]
                r["vn"][i, pl.dslice(j, 1)] = vn.astype(r["vn"].dtype)[None]
                if i + depth < L:
                    kv_start(i + depth, (i + depth) % nslots)
                kv_wait(i, i % nslots)
                qdt = q[:, None, :].astype(dt)

                def tile_body(c, acc):
                    m_a, d_a, ctx_a = acc
                    tsl = pl.dslice(c * TC, TC)
                    kc = r["kbuf"][i % nslots, :, tsl]
                    vc = r["vbuf"][i % nslots, :, tsl]
                    s_t = jnp.sum(kc * qdt, axis=2, dtype=f32) * scale
                    s_t = jnp.where(tpos + c * TC < t0, s_t, NEG_INF)
                    m_n = jnp.maximum(m_a, jnp.max(s_t, axis=1,
                                                   keepdims=True))
                    corr = jnp.exp(m_a - m_n)
                    e_t = jnp.exp(s_t - m_n)
                    ctx_n = ctx_a * corr + jnp.sum(
                        e_t[:, :, None].astype(dt) * vc, axis=1, dtype=f32)
                    d_n = d_a * corr + jnp.sum(e_t, axis=1, keepdims=True)
                    return m_n, d_n, ctx_n

                if skip_dma or dma_only:
                    m_a, d_a, ctx_a = (
                        jnp.full((G, 1), NEG_INF, f32),
                        jnp.zeros((G, 1), f32), jnp.zeros((G, Dh), f32))
                else:
                    m_a, d_a, ctx_a = jax.lax.fori_loop(
                        0, nvalid, tile_body,
                        (jnp.full((G, 1), NEG_INF, f32),
                         jnp.zeros((G, 1), f32), jnp.zeros((G, Dh), f32)))
                kch = r["kn"][i]
                vch = r["vn"][i]
                sc_kg = jnp.sum(kch.astype(dt) * q[None, :, :].astype(dt),
                                axis=2, dtype=f32) * scale
                sc = jnp.where(chpos <= j, jnp.swapaxes(sc_kg, 0, 1),
                               NEG_INF)
                m = jnp.maximum(m_a, jnp.max(sc, axis=1, keepdims=True))
                corr = jnp.exp(m_a - m)
                ec = jnp.exp(sc - m)
                denom = d_a * corr + jnp.sum(ec, axis=1, keepdims=True)
                ec_kg = jnp.swapaxes(ec, 0, 1)
                ctx = (ctx_a * corr
                       + jnp.sum(ec_kg[:, :, None].astype(dt)
                                 * vch.astype(dt), axis=0, dtype=f32))
                o = ctx / denom
                attn = dl._mm(unfold(o).astype(dt), r["swo"][i])                     + r["sbo"][i:i + 1, :]
                x = x + attn.astype(dt)
            if not skip_cross:
                h = dl._ln_rows(x, r["ln2s"][i:i + 1, :],
                                r["ln2b"][i:i + 1, :]).astype(dt)
                cq = fold(dl._mm(h, r["cwq"][i]) + r["cbq"][i:i + 1, :])
                if qk_norm:
                    cq = dl._ln_rows(cq, r["cqns"][i:i + 1, :],
                                     r["cqnb"][i:i + 1, :])
                ck = r["ck"][i]
                cv = r["cv"][i]
                s = jnp.sum(ck * cq[:, None, :].astype(dt), axis=2,
                            dtype=f32) * scale
                m = jnp.max(s, axis=1, keepdims=True)
                e = jnp.exp(s - m)
                p = e / jnp.sum(e, axis=1, keepdims=True)
                o = jnp.sum(p[:, :, None].astype(dt) * cv, axis=1,
                            dtype=f32)
                cattn = dl._mm(unfold(o).astype(dt), r["cwo"][i])                     + r["cbo"][i:i + 1, :]
                x = x + cattn.astype(dt)
            if not skip_ffn:
                h = dl._ln_rows(x, r["ln3s"][i:i + 1, :],
                                r["ln3b"][i:i + 1, :]).astype(dt)
                h = dl._mm(h, r["w1"][i]) + r["b1"][i:i + 1, :]
                h = jnp.maximum(h, 0).astype(dt)
                h = dl._mm(h, r["w2"][i]) + r["b2"][i:i + 1, :]
                x = x + h.astype(dt)
            if skip_self:
                # keep cache writes legal for the wrapper scatter
                r["kn"][i, pl.dslice(j, 1)] = jnp.zeros(
                    (1, G, Dh), r["kn"].dtype)
                r["vn"][i, pl.dslice(j, 1)] = jnp.zeros(
                    (1, G, Dh), r["vn"].dtype)

        return dl._ln_rows(x, r["lnfs"][0:1, :],
                           r["lnfb"][0:1, :]).astype(dt)

    return trunk


def make_variant(skip_embed=False, skip_head=False, skip_argmax=False,
                 fold_mask=False, trunk_fn=None):
    def kernel(t_ref, prev_ref, fin_ref, kc_ref, vc_ref, ck_ref, cv_ref,
               emb_ref, pos_ref, hw_ref, hb_ref, *rest, K, L, H, Dh,
               qk_norm, pad_id, sos_id, eos_id):
        (ln1s_ref, ln1b_ref, swqkv_ref, sbqkv_ref,
         sqns_ref, sqnb_ref, skns_ref, sknb_ref, swo_ref, sbo_ref,
         ln2s_ref, ln2b_ref, cwq_ref, cbq_ref,
         cqns_ref, cqnb_ref, cwo_ref, cbo_ref,
         ln3s_ref, ln3b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
         lnfs_ref, lnfb_ref,
         ids_ref, finout_ref, kn_ref, vn_ref,
         kbuf_ref, vbuf_ref, ksem, vsem) = rest
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
            rows=pl.dslice(pl.program_id(0) * NB * H, NB * H),
            ck=ck_ref, cv=cv_ref, kn=kn_ref, vn=vn_ref,
            ln1s=ln1s_ref, ln1b=ln1b_ref, swqkv=swqkv_ref,
            sbqkv=sbqkv_ref, sqns=sqns_ref, sqnb=sqnb_ref, skns=skns_ref,
            sknb=sknb_ref, swo=swo_ref, sbo=sbo_ref, ln2s=ln2s_ref,
            ln2b=ln2b_ref, cwq=cwq_ref, cbq=cbq_ref, cqns=cqns_ref,
            cqnb=cqnb_ref, cwo=cwo_ref, cbo=cbo_ref, ln3s=ln3s_ref,
            ln3b=ln3b_ref, w1=w1_ref, b1=b1_ref, w2=w2_ref, b2=b2_ref,
            lnfs=lnfs_ref, lnfb=lnfb_ref)

        def body(j, carry):
            prev, finished, ids = carry
            posrow = jnp.sum(
                jnp.where(kiota == j, pos_ref[:].astype(f32), 0.0),
                axis=0, keepdims=True)
            if skip_embed:
                x = jnp.zeros((NB, d), dt) + posrow.astype(dt)
            else:
                onehot = (vlane == prev).astype(dt)
                x = dl._mm(onehot, emb_ref[:]).astype(dt) * sqrt_d
                x = x + posrow.astype(dt)
            tf = trunk_fn or dl._trunk_and_ln
            h = tf(x, j, t0, trunk_refs, L=L, H=H, Dh=Dh,
                   qk_norm=qk_norm, dt=dt)
            if skip_head:
                nxt = prev
            else:
                logits = dl._mm(h, hw_ref[:]).astype(dt).astype(f32) \
                    + hb_ref[0:1, :]
                if skip_argmax:
                    nxt = prev + jnp.min(logits, axis=1,
                                         keepdims=True).astype(jnp.int32) * 0
                else:
                    if not fold_mask:
                        logits = jnp.where(
                            (vlane == pad_id) | (vlane == sos_id),
                            NEG_INF, logits)
                    if fold_mask == "lax":
                        nxt = jnp.argmax(logits, axis=1)[:, None]\
                            .astype(jnp.int32)
                    else:
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

    return kernel


def main():
    cfg = SketchformerConfig(
        vocab_size=10004, num_classes=345, max_len=T, d_model=256,
        num_layers=8, num_heads=2, dff=512, dropout=0.1, lowerdim=256,
        dtype="bfloat16", attn_impl="pallas", qk_norm=True)
    model = Sketchformer(cfg)
    dt = cfg.compute_dtype
    L, H, d = cfg.num_layers, cfg.num_heads, cfg.d_model
    Dh = d // H
    rng = np.random.default_rng(0)
    ids = rng.integers(4, cfg.vocab_size, size=(8, T)).astype(np.int32)
    enc = jnp.asarray(ids)
    dec_in = jnp.roll(enc, 1, axis=1).at[:, 0].set(1)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), enc, dec_in))["params"]
    r2 = np.random.default_rng(42)
    params = jax.tree.map(
        lambda s: jnp.asarray(r2.standard_normal(s.shape) * 0.02, s.dtype),
        shapes)

    w = stack_decoder_weights(params["decoder"], num_layers=L,
                              compute_dtype=dt)
    memory = jnp.asarray(r2.standard_normal((B, 4, d)) * 0.3, dt)
    ck, cv = precompute_cross_kv(memory, w, num_heads=H,
                                 qk_norm=cfg.qk_norm)
    emb = params["dec_embed"]["embed"]["embedding"].astype(dt)
    pos_table = jnp.asarray(sinusoidal_position_encoding(T, d), dt)
    hw = params["out_head"]["proj"]["kernel"].astype(dt)
    hb = params["out_head"]["proj"]["bias"].astype(jnp.float32)
    Tmax = 256
    kc0 = jnp.zeros((L, B * H, Tmax, Dh), dt)

    def run_fixed(chunker):
        """Fixed 12-chunk decode (no early exit), jitted once."""
        def go(kc, vc, prev, fin):
            out = jnp.full((B, T), 0, jnp.int32)

            def body(c, carry):
                kc, vc, prev, fin, out = carry
                t = c * K
                pos_chunk = jax.lax.dynamic_slice(pos_table, (t, 0), (K, d))
                ids_, fin, kn, vn = chunker(prev, fin, kc, vc, ck, cv,
                                            emb, pos_chunk, hw, hb, w, t)
                kc = jax.lax.dynamic_update_slice(kc, kn, (0, 0, t, 0))
                vc = jax.lax.dynamic_update_slice(vc, vn, (0, 0, t, 0))
                out = jax.lax.dynamic_update_slice(out, ids_, (0, t))
                return kc, vc, ids_[:, K - 1:K], fin, out

            carry = (kc, vc, prev, fin, out)
            for c in range(T // K):
                kc, vc, prev, fin, out = body(c, (carry))
                carry = (kc, vc, prev, fin, out)
            return out

        return jax.jit(go)

    def chunker(prev, fin, kc, vc, ck, cv, emb, pos_chunk, hw, hb, w, t):
        return dl.fused_decode_chunk(
            prev, fin, kc, vc, ck, cv, emb, pos_chunk, hw, hb, w,
            jnp.int32(t), num_heads=H, qk_norm=cfg.qk_norm)

    import json
    import sketchformer_tpu.ops.pallas_decode_loop as _dl
    if sys.argv[1:] and sys.argv[1].startswith("res"):
        _dl.RES_ROWS = int(sys.argv[1][3:])
        sys.argv[1:] = sys.argv[2:]
    which = sys.argv[1:] or ["clone", "one_copy"]
    all_variants = {
        "full": {},
        "clone": dict(trunk_fn=make_trunk()),
        "no_self": dict(trunk_fn=make_trunk(skip_self=True)),
        "no_cross": dict(trunk_fn=make_trunk(skip_cross=True)),
        "no_ffn": dict(trunk_fn=make_trunk(skip_ffn=True)),
        "no_qknorm": dict(trunk_fn=make_trunk(no_qknorm=True)),
        "no_dma": dict(trunk_fn=make_trunk(skip_dma=True)),
        "dma_only": dict(trunk_fn=make_trunk(dma_only=True)),
        "one_copy": dict(trunk_fn=make_trunk(one_copy=True)),
        "oc_dmaonly": dict(trunk_fn=make_trunk(one_copy=True,
                                               dma_only=True)),
    }
    variants = [(n, all_variants[n]) for n in which
                if n in all_variants]
    def run_while(chunker):
        def go(kc, vc, prev, fin):
            out = jnp.full((B, T), 0, jnp.int32)

            def cond(carry):
                _, _, _, fin, t, _ = carry
                return jnp.logical_and(
                    t < T, jnp.logical_not((fin != 0).all()))

            def body(carry):
                kc, vc, prev, fin, t, out = carry
                pos_chunk = jax.lax.dynamic_slice(pos_table, (t, 0),
                                                  (K, d))
                ids_, fin, kn, vn = chunker(prev, fin, kc, vc, ck, cv,
                                            emb, pos_chunk, hw, hb, w, t)
                kc = jax.lax.dynamic_update_slice(kc, kn, (0, 0, t, 0))
                vc = jax.lax.dynamic_update_slice(vc, vn, (0, 0, t, 0))
                out = jax.lax.dynamic_update_slice(out, ids_, (0, t))
                return kc, vc, ids_[:, K - 1:K], fin, t + K, out

            *_, out = jax.lax.while_loop(
                cond, body, (kc, vc, prev, fin, jnp.int32(0), out))
            return out

        return jax.jit(go)

    def chunker_t(prev, fin, kc, vc, ck, cv, emb, pos_chunk, hw, hb, w, t):
        return dl.fused_decode_chunk(
            prev, fin, kc, vc, ck, cv, emb, pos_chunk, hw, hb, w,
            t if hasattr(t, 'dtype') else jnp.int32(t),
            num_heads=H, qk_norm=cfg.qk_norm)

    orig = dl._loop_kernel
    prev0 = jnp.full((B, 1), 1, jnp.int32)
    fin0 = jnp.zeros((B, 1), jnp.int32)
    if "whileloop" in which:
        which.remove("whileloop")
        fn = run_while(chunker_t)
        out = fn(kc0, jnp.zeros_like(kc0), prev0, fin0)
        np.asarray(out)
        ts = []
        for _ in range(8):
            t0 = time.perf_counter()
            out = fn(kc0, jnp.zeros_like(kc0), prev0, fin0)
            np.asarray(out)
            ts.append(time.perf_counter() - t0)
        ms = np.median(ts) * 1e3
        print(f"whileloop  : {ms:7.2f} ms  ({ms/T*1e3:6.1f} us/step)",
              flush=True)
    for name, kwargs in variants:
        dl._loop_kernel = make_variant(**kwargs) if kwargs else orig
        fn = run_fixed(chunker)
        out = fn(kc0, jnp.zeros_like(kc0), prev0, fin0)
        np.asarray(out)
        ts = []
        for _ in range(8):
            t0 = time.perf_counter()
            out = fn(kc0, jnp.zeros_like(kc0), prev0, fin0)
            np.asarray(out)
            ts.append(time.perf_counter() - t0)
        ms = np.median(ts) * 1e3
        print(f"{name:11s}: {ms:7.2f} ms  ({ms/T*1e3:6.1f} us/step)",
              flush=True)
    dl._loop_kernel = orig


if __name__ == "__main__":
    main()
