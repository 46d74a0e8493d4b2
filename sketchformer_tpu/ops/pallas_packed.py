"""Packed small-head attention: full-lane kernels for head_dim < 128.

The reference geometry is num_heads=8 / head_dim=32 (SURVEY.md §2
"Sketchformer model": d_model=256, H≈8). A per-head TPU kernel loop at
Dh=32 lane-pads every q/k/v pane 4x (Mosaic rounds the minor dim of each
VMEM pane to 128 lanes) and issues 8 strided sub-128 slices per layer —
measured ~2.5x slower end-to-end in round 2. This module makes small
heads first-class by packing hpp = 128 // Dh heads into each 128-lane
pane and running attention per GROUP of hpp heads:

- q/k/v group panes are clean 128-lane slices of the fused qkv
  projection (heads are contiguous: group g's heads occupy lanes
  [128g, 128(g+1)) of the (M, H*Dh) pane) — no strided reads.
- scores: K is expanded to a BLOCK-DIAGONAL key pane K̃ of shape
  (NB, hpp*Tk, 128) — chunk h holds K masked to head-h's lane block —
  so ONE full-lane MXU dot  S̃ = K̃ · Qᵀ  yields all hpp heads' score
  matrices stacked along the SUBLANE dim (chunk h = head h's (Tk, Tq)
  scores, exactly: cross-head lane blocks are zeroed in K̃). Sublane
  chunk boundaries are 8-aligned (Tk % 8 == 0, padded for tiny cross
  memories), so per-head softmax runs on clean sublane slices.
- context: the same trick in reverse — Õ = P̃ᵀ · Ṽ lands every head's
  output in its own lane block of a (NB, Tq, 128) pane, i.e. already
  concatenated. No per-head loops, slices, or transposes anywhere.
- qk-norm (LayerNorm over each head's Dh lanes) runs SEGMENTED: block
  means/variances via two tiny matmuls against a (128, hpp) 0/1
  indicator, with scale/bias params pre-tiled to 128 lanes by the
  caller (tile_heads).

MXU cost is hpp x the algorithmic attention FLOPs — the unavoidable
price of a 128-wide systolic contraction at Dh=32 (identical to what
implicit lane padding costs) — but every op runs at full lane width and
the layer keeps the one-dot-per-matmul structure of the Dh=128 path.

Used by ops/pallas_encoder.py (the inference/encode hot path) whenever
128 % Dh == 0 and (H*Dh) % 128 == 0; the group_attn_bwd / ln_blocks_bwd32
halves are ready for the train kernels (their per-head loops still
lane-pad small heads — a measured, documented gap, docs/DESIGN.md).
AR decode serves small heads via the folded-layout chunk kernel in
ops/pallas_decode_loop.py instead (lane-padded VMEM panes, compact HBM).
Equivalence with the composed flax path is pinned by the same tests that
pin the Dh=128 kernels, parameterized over num_heads.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

LN_EPS = 1e-6
NEG_INF = -1e9

# Softmax/ds strategy for the TRAIN (save=True) packed path, read at trace
# time. "fused2": the probability pane is materialized exactly once, in
# the COMPUTE dtype, and is the ONLY score-shaped residual — bwd upcasts
# it for softmax-backward (the faithful VJP of the forward that was
# actually computed, whose context dot consumes the bf16 pane) and
# reuses it directly for the dV dot. Minimum live-VMEM variant: one bf16
# score pane per group vs seg4d's f32 pane or "fused"'s f32+bf16 pair.
# "fused": keep the UNNORMALIZED exp pane e and the per-chunk reciprocal
# denominators r as f32 residuals alongside the bf16 p; bwd's
# softmax-backward runs on (e, r): ds = e*(dp - r*<dp,e>)*r*scale.
# (round-4 verdict item 2; both measured on-chip, docs/PERF_TRAIN.md
# round 5.) "seg4d": round-4 best — one segmented op stream over the 4D
# (NB, hpp, Tk, Tq) view. "chunk": round-3 per-chunk python loop. "mxu":
# segmented sums via indicator matmuls (offloads the VPU reduce passes
# to the MXU). "ablate": timing probe ONLY — replaces softmax/ds math
# with a scalar scale (wrong values).
_TRAIN_SOFTMAX = os.environ.get("SK_PACKED_SOFTMAX", "fused2")

# Timing-only component ablations for the packed TRAIN path (comma list;
# values become WRONG — never set outside tools/ probes). Members:
# "qknorm" (ln_blocks_* -> scalar affine), "blockdiag" (expand/collapse
# -> unmasked tile/slice). Used with _TRAIN_SOFTMAX="ablate" to build the
# h8-train component ladder (docs/PERF_TRAIN.md round 4).
_ABLATE = frozenset(
    s for s in os.environ.get("SK_PACKED_ABLATE", "").split(",") if s)

# Guard against env leakage from tools/ probe runs into production
# processes: any wrong-values mode must be explicitly acknowledged, and
# even then it screams (ADVICE r4, medium).
if _ABLATE or _TRAIN_SOFTMAX == "ablate":
    if os.environ.get("SK_PACKED_ABLATE_ACK") != "1":
        raise RuntimeError(
            "SK_PACKED_ABLATE / SK_PACKED_SOFTMAX=ablate replace packed "
            "attention math with WRONG values (timing probes only). Set "
            "SK_PACKED_ABLATE_ACK=1 to acknowledge, or unset the ablation "
            f"vars (ablate={sorted(_ABLATE)}, softmax={_TRAIN_SOFTMAX!r}).")
    import warnings as _warnings

    _warnings.warn(
        "pallas_packed ABLATION ACTIVE: forward values and gradients are "
        f"WRONG (ablate={sorted(_ABLATE)}, softmax={_TRAIN_SOFTMAX!r}); "
        "timing probes only",
        stacklevel=2)


def packed_supported(d_model: int, num_heads: int) -> bool:
    """True when the packed group layout covers this head geometry."""
    if d_model % num_heads:
        return False
    dh = d_model // num_heads
    return dh < 128 and 128 % dh == 0 and d_model % 128 == 0


def tile_heads(a: jnp.ndarray, hpp: int) -> jnp.ndarray:
    """Tile per-head (L, Dh) qk-norm params to (L, hpp*Dh) lane panes."""
    return jnp.concatenate([a] * hpp, axis=-1)


def untile_heads(a: jnp.ndarray, hpp: int) -> jnp.ndarray:
    """Sum a (..., hpp*Dh) tiled-lane gradient back to (..., Dh)."""
    dh = a.shape[-1] // hpp
    return sum(a[..., i * dh:(i + 1) * dh] for i in range(hpp))


def _lane_iota():
    return jax.lax.broadcasted_iota(jnp.int32, (1, 1, 128), 2)


def _indicator(dh: int):
    """(128, hpp) f32 block indicator: ind[l, h] = 1 iff lane l is in
    head-block h. Constant-folded by Mosaic (pure iota math)."""
    hpp = 128 // dh
    lane = jax.lax.broadcasted_iota(jnp.int32, (128, hpp), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (128, hpp), 1)
    return (lane // dh == col).astype(jnp.float32)


def _bdot(a, b, dims):
    return jax.lax.dot_general(a, b, dims,
                               preferred_element_type=jnp.float32)


# batch-0 3D contraction specs: (NB, X, Y) operands
_C22 = (((2,), (2,)), ((0,), (0,)))   # contract minor with minor
_C11 = (((1,), (1,)), ((0,), (0,)))   # contract sublane with sublane
_C21 = (((2,), (1,)), ((0,), (0,)))   # contract minor with sublane


def expand_blockdiag(a: jnp.ndarray, dh: int) -> jnp.ndarray:
    """(NB, Tk, 128) -> block-diagonal (NB, hpp*Tk, 128): chunk h is ``a``
    with every lane outside head-block h zeroed."""
    hpp = 128 // dh
    if "blockdiag" in _ABLATE:   # timing probe: tile without masking
        return jnp.concatenate([a] * hpp, axis=1)
    lane = _lane_iota()
    blk = lane // dh
    return jnp.concatenate(
        [jnp.where(blk == h, a, 0) for h in range(hpp)], axis=1)


def collapse_blockdiag(a: jnp.ndarray, dh: int, tk: int) -> jnp.ndarray:
    """Adjoint of expand_blockdiag: (NB, hpp*Tk, 128) -> (NB, Tk, 128),
    keeping chunk h's head-block-h lanes."""
    hpp = 128 // dh
    if "blockdiag" in _ABLATE:   # timing probe: first chunk, unmasked
        return a[:, :tk, :]
    lane = _lane_iota()
    blk = lane // dh
    out = None
    for h in range(hpp):
        part = jnp.where(blk == h, a[:, h * tk:(h + 1) * tk, :], 0)
        out = part if out is None else out + part
    return out


def group_attn_fwd(q, k, v, *, dh, scale, dt, bias=None, causal=None,
                   save=False):
    """Attention over one packed group of hpp = 128//dh heads.

    q: (NB, Tq, 128); k, v: (NB, Tk, 128) with Tk % 8 == 0 (caller pads
    tiny cross memories). bias: optional (NB, 1, Tk) additive f32 bias
    (lane-oriented: NEG_INF on masked/padded KEY lanes — same layout as
    the per-head kernel path). causal: optional (1, Tq, Tk) causal f32
    bias. Returns the (NB, Tq, 128) f32 context pane (heads
    pre-concatenated in their lane blocks) and, if ``save``, the
    (kt, vt, p) residuals for group_attn_bwd.

    The inference path (save=False) STREAMS the hpp head chunks — masked
    K panes are consumed per chunk instead of materializing the
    block-diagonal (NB, hpp*Tk, 128) panes. Scores are Q-MAJOR
    (NB, Tq, Tk): softmax reduces over the LANE axis (the fast VPU
    reduction orientation — the transposed sublane-reducing variant
    measured 38.8k sk/s at H=8/T=192 v5e), exp panes are cast to the
    compute dtype before the context dot, and the hpp per-head softmax
    denominators fold into ONE (NB, Tq, 128) reciprocal multiply after
    the accumulated context dot (built with an indicator matmul — no
    transposes anywhere).
    """
    tk = k.shape[1]
    hpp = 128 // dh
    if save:
        kt = expand_blockdiag(k, dh)
        vt = expand_blockdiag(v, dh)
        s = _bdot(kt, q, _C22) * scale        # (NB, hpp*Tk, Tq) f32
        if _TRAIN_SOFTMAX in ("fused", "fused2"):
            NB, K, Tq = s.shape
            s4 = s.reshape(NB, hpp, tk, Tq)
            if causal is not None:
                s4 = s4 + jnp.swapaxes(causal, 1, 2)[:, None]
            if bias is not None:
                s4 = s4 + jnp.swapaxes(bias, 1, 2)[:, None]
            m = jnp.max(s4, axis=2, keepdims=True)     # (NB, hpp, 1, Tq)
            e4 = jnp.exp(s4 - m)
            r = 1.0 / jnp.sum(e4, axis=2, keepdims=True)
            # the ONLY materialization of the probability pane — bf16,
            # shared by this context dot and bwd's dV dot
            p_dt = (e4 * r).reshape(NB, K, Tq).astype(dt)
            o = _bdot(p_dt, vt, _C11)         # (NB, Tq, 128) f32
            if _TRAIN_SOFTMAX == "fused2":
                # e4/r die here: the compute-dtype pane is the one
                # score-shaped residual that stays live across the
                # kernel's FFN-backward phase
                return o, ("fused2", kt, vt, p_dt)
            return o, ("fused", kt, vt, e4, r, p_dt)
        p = _seg_softmax(s, hpp, tk, causal=causal, bias=bias)
        o = _bdot(p.astype(dt), vt, _C11)     # (NB, Tq, 128) f32
        return o, ("p", kt, vt, p)

    # Inference: STREAM the hpp head chunks in q-major orientation —
    # chunk h masks K/V to head-block h's lanes (q is used unmasked: the
    # zeroed K lanes kill the cross-head products), softmax reduces over
    # the LANE axis, and the hpp per-head denominators fold into ONE
    # (NB, Tq, 128) reciprocal multiply after the accumulated context
    # dot. The block-diagonal-Q single-softmax variant measured WORSE
    # (39.3k vs 42.0k sk/s, H=8/T=192 v5e): the hpp-times-larger q̃ pane
    # and its whole-pane exp cost more than the per-chunk pass saves.
    lane = _lane_iota()
    blk = lane // dh
    # (Measured dead ends at H=8/T=192 v5e, for the next optimizer:
    # exp2-domain softmax with log2e folded into scale — 42.0k, parity;
    # block-diagonal-Q single-softmax — 39.3k; sublane-oriented scores —
    # 38.8k; dropping the max-subtraction — 44.5k but numerically unsafe
    # for production. This streaming form is the measured best: 42.2k.)
    o = None
    denoms = []
    for h in range(hpp):
        kh = jnp.where(blk == h, k, 0)
        sh = _bdot(q, kh, _C22) * scale       # (NB, Tq, Tk) f32
        if causal is not None:
            sh = sh + causal
        if bias is not None:
            sh = sh + bias
        m = jnp.max(sh, axis=2, keepdims=True)
        e32 = jnp.exp(sh - m)
        denoms.append(jnp.sum(e32, axis=2, keepdims=True))   # (NB, Tq, 1)
        vh = jnp.where(blk == h, v, 0)
        oc = _bdot(e32.astype(dt), vh, _C21)  # (NB, Tq, 128) f32
        o = oc if o is None else o + oc
    rec = 1.0 / jnp.concatenate(denoms, axis=2)              # (NB, Tq, hpp)
    # (NB, Tq, 128) per-lane reciprocal tile: rtile[t, l] = rec[t, blk(l)]
    rtile = _bdot(rec, _indicator(dh), (((2,), (1,)), ((), ())))
    return o * rtile


def _seg_matrix(hpp: int, tk: int) -> jnp.ndarray:
    """(hpp, hpp*tk) f32 chunk indicator: seg[c, s] = 1 iff sublane s
    belongs to chunk c. Pure iota math — Mosaic constant-folds it."""
    row = jax.lax.broadcasted_iota(jnp.int32, (hpp, hpp * tk), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (hpp, hpp * tk), 1)
    return (col // tk == row).astype(jnp.float32)


def _seg_matrix_t(hpp: int, tk: int) -> jnp.ndarray:
    """(hpp*tk, hpp) transpose of _seg_matrix (built directly: no
    in-kernel transposes)."""
    row = jax.lax.broadcasted_iota(jnp.int32, (hpp * tk, hpp), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (hpp * tk, hpp), 1)
    return (row // tk == col).astype(jnp.float32)


def _seg_softmax(s, hpp, tk, *, causal=None, bias=None):
    """Per-chunk softmax over the SUBLANE axis of the stacked
    (NB, hpp*Tk, Tq) score pane (chunk c = head c's (Tk, Tq) scores).
    Strategy per _TRAIN_SOFTMAX; all variants are value-identical except
    'ablate' (a VPU-cost timing probe)."""
    NB, K, Tq = s.shape
    if _TRAIN_SOFTMAX == "ablate":
        return s * 0.01
    if _TRAIN_SOFTMAX == "chunk":
        chunks = []
        for h in range(hpp):
            sh = s[:, h * tk:(h + 1) * tk, :]
            if causal is not None:
                sh = sh + jnp.swapaxes(causal, 1, 2)
            if bias is not None:
                sh = sh + jnp.swapaxes(bias, 1, 2)
            m = jnp.max(sh, axis=1, keepdims=True)
            e = jnp.exp(sh - m)
            chunks.append(e / jnp.sum(e, axis=1, keepdims=True))
        return jnp.concatenate(chunks, axis=1)
    # segmented variants: one op stream over the (NB, hpp, tk, Tq) view
    # (tk % 8 == 0, so the sublane split is tile-aligned)
    s4 = s.reshape(NB, hpp, tk, Tq)
    if causal is not None:
        s4 = s4 + jnp.swapaxes(causal, 1, 2)[:, None]
    if bias is not None:
        s4 = s4 + jnp.swapaxes(bias, 1, 2)[:, None]
    m = jnp.max(s4, axis=2, keepdims=True)    # (NB, hpp, 1, Tq)
    e4 = jnp.exp(s4 - m)
    if _TRAIN_SOFTMAX == "seg4d":
        p4 = e4 * (1.0 / jnp.sum(e4, axis=2, keepdims=True))
        return p4.reshape(NB, K, Tq)
    # "mxu": per-chunk sums + reciprocal broadcast via indicator matmuls
    e = e4.reshape(NB, K, Tq)
    segb = jnp.broadcast_to(_seg_matrix(hpp, tk), (NB, hpp, K))
    rec = 1.0 / _bdot(segb, e, _C21)          # (NB, hpp, Tq)
    segtb = jnp.broadcast_to(_seg_matrix_t(hpp, tk), (NB, K, hpp))
    return e * _bdot(segtb, rec, _C21)        # (NB, K, Tq)


def _seg_ds(p, dp, hpp, tk):
    """Softmax backward ds = p * (dp - <dp, p>_chunk), segmented like
    _seg_softmax (variants value-identical except 'ablate')."""
    NB, K, Tq = p.shape
    if _TRAIN_SOFTMAX == "ablate":
        return dp * 0.01
    if _TRAIN_SOFTMAX == "chunk":
        out = []
        for h in range(hpp):
            ph = p[:, h * tk:(h + 1) * tk, :]
            dph = dp[:, h * tk:(h + 1) * tk, :]
            out.append(
                ph * (dph - jnp.sum(dph * ph, axis=1, keepdims=True)))
        return jnp.concatenate(out, axis=1)
    if _TRAIN_SOFTMAX == "seg4d":
        p4 = p.reshape(NB, hpp, tk, Tq)
        dp4 = dp.reshape(NB, hpp, tk, Tq)
        inner = jnp.sum(dp4 * p4, axis=2, keepdims=True)
        return (p4 * (dp4 - inner)).reshape(NB, K, Tq)
    # "mxu"
    t = dp * p
    segb = jnp.broadcast_to(_seg_matrix(hpp, tk), (NB, hpp, K))
    inner = _bdot(segb, t, _C21)              # (NB, hpp, Tq)
    segtb = jnp.broadcast_to(_seg_matrix_t(hpp, tk), (NB, K, hpp))
    return p * (dp - _bdot(segtb, inner, _C21))


def group_attn_bwd(do, q, res, *, dh, scale, dt):
    """Backward for group_attn_fwd(save=True). ``do``: (NB, Tq, 128) f32
    upstream; ``res``: the opaque residual tuple group_attn_fwd returned.
    Returns (dq, dk, dv) as (NB, Tq, 128) / (NB, Tk, 128) f32 panes
    (callers slice off cross-memory padding rows if any)."""
    hpp = 128 // dh
    kt, vt = res[1], res[2]
    tk = kt.shape[1] // hpp
    do_dt = do.astype(dt)
    dp = _bdot(vt, do_dt, _C22)               # (NB, hpp*Tk, Tq) f32
    if res[0] == "fused2":
        p_dt = res[3]
        NB, K, Tq = dp.shape
        # softmax-backward on the upcast compute-dtype pane — the
        # faithful VJP of the forward that actually ran (its context dot
        # consumed this exact pane); on f32 backends the cast is free
        # and the math is bit-identical to seg4d
        p4 = p_dt.astype(jnp.float32).reshape(NB, hpp, tk, Tq)
        dp4 = dp.reshape(NB, hpp, tk, Tq)
        inner = jnp.sum(dp4 * p4, axis=2, keepdims=True)
        ds4 = p4 * (dp4 - inner) * scale
        ds_lp = ds4.reshape(NB, K, Tq).astype(dt)
        dvt = _bdot(p_dt, do_dt, _C21)        # reuses the fwd's bf16 pane
    elif res[0] == "fused":
        _, _, _, e4, r, p_dt = res
        NB, K, Tq = dp.shape
        dp4 = dp.reshape(NB, hpp, tk, Tq)
        # ds = p*(dp - <dp, p>_chunk)*scale with p = e*r, refactored so
        # the f32 probability pane never materializes: the inner product
        # runs on e (rescaled by r afterwards, same value to rounding)
        # and the final combine folds r*scale into one broadcast factor
        ie = jnp.sum(dp4 * e4, axis=2, keepdims=True)   # (NB, hpp, 1, Tq)
        ds4 = e4 * (dp4 - r * ie) * (r * scale)
        ds_lp = ds4.reshape(NB, K, Tq).astype(dt)
        dvt = _bdot(p_dt, do_dt, _C21)        # reuses the fwd's bf16 pane
    else:
        p = res[3]
        ds = _seg_ds(p, dp, hpp, tk) * scale
        ds_lp = ds.astype(dt)
        dvt = _bdot(p.astype(dt), do_dt, _C21)
    dq = _bdot(ds_lp, kt, _C11)               # (NB, Tq, 128) f32
    dkt = _bdot(ds_lp, q.astype(dt), _C21)    # (NB, hpp*Tk, 128) f32
    dk = collapse_blockdiag(dkt, dh, tk)
    dv = collapse_blockdiag(dvt, dh, tk)
    return dq, dk, dv


# Block-LN lowering strategy. "square": ONE (M,128)x(128,128) block-mean
# matmul per reduction — the MXU-native tile, no thin panes. "thin": the
# round-3 pair of indicator dots (M,128)x(128,hpp) then (M,hpp)x(hpp,128),
# whose (M, hpp<=4) intermediates force pathological Mosaic relayouts —
# the round-4 ablation ladder measured the thin form costing 7.4 ms (enc)
# / 6.0 ms (dec) of the isolated h8 fwd+bwd (docs/PERF_TRAIN.md round 4).
_BLOCKLN = os.environ.get("SK_PACKED_BLOCKLN", "square")


def _blockmean_mat(dh: int) -> jnp.ndarray:
    """(128, 128) f32 block-mean operator: Bm[i, j] = 1/dh iff lanes i, j
    share a dh-lane head block. Pure iota math — constant-folded."""
    i = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    return ((i // dh) == (j // dh)).astype(jnp.float32) / dh


_CLANE = (((1,), (0,)), ((), ()))     # (M, 128) x (128, N) plain dot


def _blockmean(a32, dh, shp):
    """Segmented mean over each dh-lane block, broadcast back to lanes."""
    flat = a32.reshape(-1, 128)
    if _BLOCKLN == "square":
        return _bdot(flat, _blockmean_mat(dh), _CLANE).reshape(shp)
    ind = _indicator(dh)
    mb = _bdot(flat, ind / dh, _CLANE)            # (M, hpp)
    return _bdot(mb, ind, (((1,), (1,)), ((), ()))).reshape(shp)


def ln_blocks_fwd32(x, scale_t, bias_t, dh):
    """Segmented LayerNorm over each dh-lane head block of a (..., 128)
    f32 pane. ``scale_t`` / ``bias_t`` are (1, 128) pre-tiled rows
    (tile_heads). Returns (y32, xhat, rstd) with xhat/rstd full panes."""
    x32 = x.astype(jnp.float32)
    if "qknorm" in _ABLATE:      # timing probe: scalar affine stand-in
        return x32 * scale_t + bias_t, x32, x32
    shp = x32.shape
    mu = _blockmean(x32, dh, shp)
    var = _blockmean(x32 * x32, dh, shp)
    var = jnp.maximum(var - mu * mu, 0.0)
    rstd = jax.lax.rsqrt(var + LN_EPS)
    xhat = (x32 - mu) * rstd
    return xhat * scale_t + bias_t, xhat, rstd


def ln_blocks_bwd32(dy32, xhat, rstd, scale_t, dh):
    """Backward of ln_blocks_fwd32. Returns (dx32, dscale_row, dbias_row)
    with the param grads as (1, 128) TILED rows — the VJP wrapper reduces
    tiles to (Dh,) via untile_heads."""
    if "qknorm" in _ABLATE:      # timing probe: scalar affine stand-in
        red0 = tuple(range(dy32.ndim - 1))
        return (dy32 * scale_t,
                jnp.sum(dy32 * xhat, axis=red0)[None, :],
                jnp.sum(dy32, axis=red0)[None, :])
    shp = dy32.shape
    dxhat = dy32 * scale_t
    m1 = _blockmean(dxhat, dh, shp)
    m2 = _blockmean(dxhat * xhat, dh, shp)
    dx = rstd * (dxhat - m1 - xhat * m2)
    red = tuple(range(dy32.ndim - 1))
    ds = jnp.sum(dy32 * xhat, axis=red)[None, :]
    db = jnp.sum(dy32, axis=red)[None, :]
    return dx, ds, db


def causal_bias(tq: int, tk: int | None = None):
    """Causal bias (1, Tq, Tk): query row t may attend key lane t' iff
    t' <= t."""
    tk = tq if tk is None else tk
    row = jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 1)
    return jnp.where(col <= row, 0.0, NEG_INF)[None]


def pad_kv_rows(k, v, bias, tk_pad):
    """Pad cross-memory K/V (NB, Mq, 128) to Tk = tk_pad rows (8-aligned
    sublane chunks) and extend the lane-oriented bias (·, 1, Mq) with
    NEG_INF lanes so padded keys never receive attention mass."""
    nb, mq, _ = k.shape
    pad = tk_pad - mq
    if pad == 0:
        return k, v, bias
    zrows = jnp.zeros((nb, pad, 128), k.dtype)
    k = jnp.concatenate([k, zrows], axis=1)
    v = jnp.concatenate([v, zrows], axis=1)
    if bias is None:
        bias = jnp.zeros((1, 1, mq), jnp.float32)
    bias = jnp.concatenate(
        [jnp.broadcast_to(bias, (bias.shape[0], 1, mq)),
         jnp.full((bias.shape[0], 1, pad), NEG_INF, jnp.float32)],
        axis=2)
    return k, v, bias
