"""Whole-stack AR decode-step kernel: one pallas call per decode step.

The per-step cost of batched greedy decode is NOT compute (a B=64 single-
token step is ~0.6 GFLOP) and NOT bandwidth (~25 MB of weights+cache):
it is the ~100 XLA ops the composed per-layer step issues inside the
scan body — measured ~0.53 ms/step on v5e where the memory bound is
~0.07 ms. This kernel runs the ENTIRE L-layer decoder step (causal
cached self-attention, cross-attention to the precomputed bottleneck
memory KV, FFN, all LayerNorms) in one pallas call per batch grid cell.

Layout: everything per-head is HEAD-FOLDED (row = b*H + h), matching the
cache protocol of models/attention.py's decode branch — q/k/v fold via
free leading-dim reshapes of the (NB, H*Dh) projection panes, so the
kernel contains NO per-head loops, NO strided reads, and NO transposes.

Cache protocol:
- caches are stacked (L, B*H, Tmax, Dh), storing POST-qk-norm keys; the
  kernel reads rows [0, t) and emits the NEW row (L, B*H, Dh) for k and
  v — the caller scatters it at position t with one donated
  ``dynamic_update_slice`` (writing the full cache back from the kernel
  would double the per-step HBM traffic).
- cross-attention K/V are position-independent during decode: they are
  precomputed ONCE per decode in folded layout (L, B*H, Mq, Dh) each,
  keys already qk-normed (precompute_cross_kv).
- ``t`` arrives by scalar prefetch: one compiled kernel serves every step.

Scores use VPU broadcast-multiply + lane reductions (single-position
queries would waste the MXU); trunk matvecs use the MXU over the NB-row
batch pane. Equivalence vs the composed flax decode path is pinned by
tests/test_fast_decode.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9

# Per-cell VMEM is dominated by the (L, NB*H, Tmax, Dh) bf16 k+v cache
# blocks; the budget maximizes NB (fewer grid cells — per-cell launch
# overhead is the decode-step floor). Flagship (L8/H2/Tmax200/Dh128):
# NB=16 -> 26MB caches + 2.6MB resident weights under the 32MB limit.
CACHE_VMEM_BUDGET = 27 * 1024 * 1024


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _ln_rows(x, s_row, b_row):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(x32 * x32, axis=-1, keepdims=True) - mu * mu, 0.0)
    y = (x32 - mu) * jax.lax.rsqrt(var + 1e-6)
    return y * s_row + b_row


def _mm(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)


def _step_kernel(
    t_ref,                       # scalar prefetch: (1,) int32 position
    x_ref, kc_ref, vc_ref, ck_ref, cv_ref,
    ln1s_ref, ln1b_ref, swqkv_ref, sbqkv_ref,
    sqns_ref, sqnb_ref, skns_ref, sknb_ref, swo_ref, sbo_ref,
    ln2s_ref, ln2b_ref, cwq_ref, cbq_ref,
    cqns_ref, cqnb_ref, cwo_ref, cbo_ref,
    ln3s_ref, ln3b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
    lnfs_ref, lnfb_ref,
    h_ref, kn_ref, vn_ref, *,
    L, H, Dh, qk_norm,
):
    t = t_ref[0]
    NB = x_ref.shape[0]
    d = x_ref.shape[2]
    Tmax = kc_ref.shape[2]
    G = NB * H
    HD = H * Dh
    dt = x_ref.dtype
    f32 = jnp.float32
    scale = 1.0 / (Dh ** 0.5)
    x = x_ref[:].reshape(NB, d)

    def fold(pane):                     # (NB, HD) f32 -> (G, Dh)
        return pane.reshape(G, Dh)

    def unfold(pane):                   # (G, Dh) f32 -> (NB, HD)
        return pane.reshape(NB, HD)

    for i in range(L):
        # ---- cached causal self-attention (single position) -------------
        h = _ln_rows(x, ln1s_ref[i:i + 1, :], ln1b_ref[i:i + 1, :]
                     ).astype(dt)
        qkv = _mm(h, swqkv_ref[i]) + sbqkv_ref[i:i + 1, :]  # (NB, 3HD) f32
        q = fold(qkv[:, :HD])
        kn = fold(qkv[:, HD:2 * HD])
        vn = fold(qkv[:, 2 * HD:])
        if qk_norm:
            q = _ln_rows(q, sqns_ref[i:i + 1, :], sqnb_ref[i:i + 1, :])
            kn = _ln_rows(kn, skns_ref[i:i + 1, :], sknb_ref[i:i + 1, :])
        # score/context products stay bf16 (2x VPU throughput; the
        # decode step is VPU-elementwise-bound) with f32 accumulation.
        # NOTE: minor-dim inserts happen on the f32 operand BEFORE the
        # bf16 cast — Mosaic only supports non-no-op minor-dim inserts
        # for 32-bit types.
        kc = kc_ref[i]                              # (G, Tmax, Dh) dt
        vc = vc_ref[i]
        s = jnp.sum(kc * q[:, None, :].astype(dt), axis=2,
                    dtype=f32) * scale                      # (G, Tmax)
        pos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(pos < t, s, NEG_INF)
        s_new = jnp.sum(q * kn, axis=1, keepdims=True) * scale
        m = jnp.maximum(jnp.max(s, axis=1, keepdims=True), s_new)
        e = jnp.exp(s - m)
        e_new = jnp.exp(s_new - m)                          # (G, 1)
        denom = jnp.sum(e, axis=1, keepdims=True) + e_new
        ctx = jnp.sum(e[:, :, None].astype(dt) * vc, axis=1,
                      dtype=f32)                            # (G, Dh)
        o = (ctx + e_new * vn) / denom
        kn_ref[i] = kn.astype(kn_ref.dtype)
        vn_ref[i] = vn.astype(vn_ref.dtype)
        attn = _mm(unfold(o).astype(dt), swo_ref[i]) + sbo_ref[i:i + 1, :]
        x = x + attn.astype(dt)
        # ---- cross-attention (precomputed folded memory KV) -------------
        h = _ln_rows(x, ln2s_ref[i:i + 1, :], ln2b_ref[i:i + 1, :]
                     ).astype(dt)
        cq = fold(_mm(h, cwq_ref[i]) + cbq_ref[i:i + 1, :])  # (G, Dh)
        if qk_norm:
            cq = _ln_rows(cq, cqns_ref[i:i + 1, :], cqnb_ref[i:i + 1, :])
        ck = ck_ref[i]                              # (G, Mq, Dh) dt
        cv = cv_ref[i]
        s = jnp.sum(ck * cq[:, None, :].astype(dt), axis=2,
                    dtype=f32) * scale                       # (G, Mq)
        m = jnp.max(s, axis=1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=1, keepdims=True)
        o = jnp.sum(p[:, :, None].astype(dt) * cv, axis=1,
                    dtype=f32)                               # (G, Dh)
        cattn = _mm(unfold(o).astype(dt), cwo_ref[i]) + cbo_ref[i:i + 1, :]
        x = x + cattn.astype(dt)
        # ---- FFN ---------------------------------------------------------
        h = _ln_rows(x, ln3s_ref[i:i + 1, :], ln3b_ref[i:i + 1, :]
                     ).astype(dt)
        h = (_mm(h, w1_ref[i]) + b1_ref[i:i + 1, :])
        h = jnp.maximum(h, 0).astype(dt)
        h = _mm(h, w2_ref[i]) + b2_ref[i:i + 1, :]
        x = x + h.astype(dt)

    h_ref[:] = _ln_rows(x, lnfs_ref[0:1, :], lnfb_ref[0:1, :]
                        ).astype(h_ref.dtype).reshape(NB, 1, d)


_STEP_WKEYS = ("ln1s", "ln1b", "s_wqkv", "s_bqkv", "s_qns", "s_qnb",
               "s_kns", "s_knb", "s_wo", "s_bo",
               "ln2s", "ln2b", "c_wq", "c_bq", "c_qns", "c_qnb",
               "c_wo", "c_bo", "ln3s", "ln3b", "w1", "b1", "w2", "b2",
               "lnfs", "lnfb")


def _nb(B, L, H, Tmax, Dh, itemsize):
    per_batch = 2 * L * H * Tmax * max(Dh, 128) * itemsize
    nb = max(1, CACHE_VMEM_BUDGET // max(per_batch, 1))
    while nb > 1 and B % nb:
        nb -= 1
    return nb


def fused_decode_step(
    x: jnp.ndarray,          # (B, d) current-position trunk input (embedded)
    k_cache: jnp.ndarray,    # (L, B*H, Tmax, Dh) post-qk-norm keys
    v_cache: jnp.ndarray,    # (L, B*H, Tmax, Dh)
    cross_k: jnp.ndarray,    # (L, B*H, Mq, Dh) precomputed (qk-normed)
    cross_v: jnp.ndarray,    # (L, B*H, Mq, Dh)
    w: dict,                 # stack_decoder_weights dict
    t: jnp.ndarray,          # scalar int32 position (= valid cache rows)
    *,
    num_heads: int,
    qk_norm: bool = False,
):
    """One full decoder-stack AR step. Returns (h, k_new, v_new): the
    post-ln_out hidden (B, d) and the (L, B*H, Dh) cache rows for
    position ``t`` (scatter with a donated dynamic_update_slice)."""
    B, d = x.shape
    L, BH, Tmax, Dh = k_cache.shape
    H = num_heads
    Mq = cross_k.shape[2]
    NB = _nb(B, L, H, Tmax, Dh, k_cache.dtype.itemsize)

    # x/h panes are (B, 1, d) so the trailing block dims equal the array
    # dims for any NB (Mosaic tiling rule)
    spec_x = pl.BlockSpec((NB, 1, d), lambda g, *_: (g, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_cache = pl.BlockSpec((L, NB * H, Tmax, Dh),
                              lambda g, *_: (0, g, 0, 0),
                              memory_space=pltpu.VMEM)
    spec_ckv = pl.BlockSpec((L, NB * H, Mq, Dh),
                            lambda g, *_: (0, g, 0, 0),
                            memory_space=pltpu.VMEM)
    spec_new = pl.BlockSpec((L, NB * H, Dh), lambda g, *_: (0, g, 0),
                            memory_space=pltpu.VMEM)

    def wspec(a):
        zeros = (0,) * a.ndim
        return pl.BlockSpec(a.shape, lambda g, *_a, _z=zeros: _z,
                            memory_space=pltpu.VMEM)

    wargs = [w[k] for k in _STEP_WKEYS]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // NB,),
        in_specs=[spec_x, spec_cache, spec_cache, spec_ckv, spec_ckv]
        + [wspec(a) for a in wargs],
        out_specs=(spec_x, spec_new, spec_new),
    )
    h, kn, vn = pl.pallas_call(
        functools.partial(_step_kernel, L=L, H=H, Dh=Dh, qk_norm=qk_norm),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, 1, d), x.dtype),
            jax.ShapeDtypeStruct((L, BH, Dh), k_cache.dtype),
            jax.ShapeDtypeStruct((L, BH, Dh), v_cache.dtype),
        ),
        interpret=_use_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * L * (6 * d * d + 2 * d * w["w1"].shape[2]),
            bytes_accessed=(k_cache.size + v_cache.size)
            * k_cache.dtype.itemsize,
            transcendentals=B * H * L * Tmax,
        ),
    )(jnp.reshape(t.astype(jnp.int32), (1,)), x[:, None, :], k_cache,
      v_cache, cross_k, cross_v, *wargs)
    return h[:, 0, :], kn, vn


def precompute_cross_kv(memory: jnp.ndarray, w: dict, *, num_heads: int,
                        qk_norm: bool = False):
    """(B, Mq, d) bottleneck memory -> folded (L, B*H, Mq, Dh) cross K
    and V, with K already qk-normed (matches MultiHeadAttention)."""
    L = w["c_wkv"].shape[0]
    B, Mq, d = memory.shape
    HD = w["c_wkv"].shape[2] // 2
    H = num_heads
    Dh = HD // H
    ks, vs = [], []
    for i in range(L):
        kv = (memory.reshape(B * Mq, d) @ w["c_wkv"][i]
              + w["c_bkv"][i].astype(memory.dtype)).reshape(B, Mq, 2 * HD)
        k = kv[..., :HD].reshape(B, Mq, H, Dh)
        v = kv[..., HD:].reshape(B, Mq, H, Dh)
        if qk_norm:
            x32 = k.astype(jnp.float32)
            mu = x32.mean(-1, keepdims=True)
            var = jnp.maximum((x32 * x32).mean(-1, keepdims=True)
                              - mu * mu, 0.0)
            k = ((x32 - mu) * jax.lax.rsqrt(var + 1e-6)
                 * w["c_kns"][i] + w["c_knb"][i]).astype(kv.dtype)
        # fold: (B, Mq, H, Dh) -> (B, H, Mq, Dh) -> (B*H, Mq, Dh)
        ks.append(k.transpose(0, 2, 1, 3).reshape(B * H, Mq, Dh))
        vs.append(v.transpose(0, 2, 1, 3).reshape(B * H, Mq, Dh))
    return jnp.stack(ks), jnp.stack(vs)
