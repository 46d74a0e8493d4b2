"""Fused whole-stack encoder kernel: the TPU speed-of-light encode path.

Why this exists (measured, tools/ablate_encoder.py on v5e, B=2048/T=192):
the composed XLA encoder spends ~8.8 ms in FFN matmuls (95% of bf16 peak —
nothing to win there) but ~23 ms more on the four d_model x d_model
attention projections and ~10 ms on 16 standalone LayerNorm passes. At
d_model=256 every one of those ops is HBM-bandwidth-bound: each reads and
writes the full (B, T, d) activation (~200 MB), so the layer stack costs
~15 HBM round-trips per layer while the MXU idles.

The fix is residency, not faster matmuls: ONE pallas kernel runs the
entire L-layer encoder per batch-group grid cell. Activations live in VMEM
from first LN to final LN; the only HBM traffic is x in, y out, and ONE
fetch of the stacked weights (~8.4 MB bf16 for the flagship 8-layer trunk
— the weight BlockSpecs use constant index maps, so Mosaic's revolving
buffers fetch them once and reuse them across every grid step).

Scope (asserted): pre-LN ("norm_first") encoder layers, optional qk-norm,
optional (B, T) key mask, forward/inference only — this is the encode /
embedding-extraction hot path (BASELINE.md north star). Training keeps the
per-op path in ops/pallas_attention.py, which has a custom VJP.

Head loop: head_dim=128 fills the lane width; H is small (flagship H=2),
so heads are a python-unrolled loop of NB-batched MXU dots — no (T, H)
relayout transposes anywhere (operands stay (NB*T, features) with heads as
minor-dim slices at 128-lane boundaries).

Reference parity: this computes exactly Encoder.__call__ from
models/transformer.py (reference: TF2 tutorial-style encoder stack,
SURVEY.md §2 "Transformer layers"); equivalence is pinned by
tests/test_pallas_encoder.py against the composed flax path.
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

NEG_INF = -1e9
LN_EPS = 1e-6  # flax nn.LayerNorm default

# Activation VMEM budget per grid cell (bytes), on top of the resident
# stacked weights. Tuned on v5e (sweep 1/2/4/6/8 MB at T=96/192, B=2048:
# 6 MB best — T96 157.7k sk/s, T192 73.6k; 8 MB flat-to-worse, 2 MB -17%).
ACT_VMEM_BUDGET = int(
    os.environ.get("SK_ENC_FWD_VMEM_MB", "6")) * 1024 * 1024
MAX_FUSED_LEN = 1024


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _ln(x, scale_ref, bias_ref, idx, out_dtype):
    """f32-statistics LayerNorm over the minor axis; params row ``idx`` of a
    stacked (L, d) f32 ref (or the whole (1, d) ref for the final LN)."""
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(x32 * x32, axis=-1, keepdims=True) - mu * mu, 0.0)
    y = (x32 - mu) * jax.lax.rsqrt(var + LN_EPS)
    s = scale_ref[idx:idx + 1, :]
    b = bias_ref[idx:idx + 1, :]
    return (y * s + b).astype(out_dtype)


def _stack_kernel(
    x_ref, bias_ref,
    ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref,
    qns_ref, qnb_ref, kns_ref, knb_ref,
    wo_ref, bo_ref, ln2s_ref, ln2b_ref,
    w1_ref, b1_ref, w2_ref, b2_ref,
    lnfs_ref, lnfb_ref,
    *refs, **kw,
):
    L = kw["L"]; H = kw["H"]; Dh = kw["Dh"]; scale = kw["scale"]
    use_mask = kw["use_mask"]; qk_norm = kw["qk_norm"]
    packed = kw.get("packed", False)
    final_ln = kw.get("final_ln", True)
    collect = kw.get("collect_inputs", False)
    # u8 dropout threshold (0 = off), semantics of models/dropout.py.
    # drop_impl='bits': an EXTERNAL (2L, NB, T, d) u8 input generated once
    # in XLA, shared bit-for-bit by the fwd and bwd kernels.
    # drop_impl='prng': bytes drawn in-kernel from the hardware PRNG,
    # keyed per (site, global batch element) so the bwd kernels regenerate
    # the identical streams at any grid NB (ops/pallas_dropout.py) — this
    # removes the bits tensor's HBM round-trip (~504 MB/step flagship).
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
    xins_ref = refs.pop(0) if collect else None  # (L, NB, T, d)
    NB, T, d = x_ref.shape
    dt = x_ref.dtype
    M = NB * T
    HD = H * Dh
    keep_scale = None
    if thresh > 0:
        keep_scale = jnp.asarray(1.0 / (1.0 - thresh / 256.0), dt)
    x = x_ref[:].reshape(M, d)
    if use_mask:
        kbias = bias_ref[:]                      # (NB, 1, T) f32 additive

    def drop(val, site, bpane=None):
        if thresh == 0:
            return val
        if drop_impl == "prng":
            bits = bpane        # pre-drawn (M, d) byte pane for this site
        else:
            # i32 widen: Mosaic has no u8 compare on this target
            bits = drop_ref[site].reshape(M, d).astype(jnp.int32)
        return jnp.where(bits >= thresh, val * keep_scale, 0).astype(dt)

    for i in range(L):
        if collect:
            xins_ref[i] = x.reshape(NB, T, d)
        if thresh > 0 and drop_impl == "prng":
            # one PRNG draw per layer serves both sites (bytes 0 and 1)
            lbytes = pdrop.draw_layer_bytes(
                seed_ref[0], i, pl.program_id(0), NB, T, d, 2)
        else:
            lbytes = (None, None)
        # ---- attention sublayer (pre-LN) --------------------------------
        h = _ln(x, ln1s_ref, ln1b_ref, i, dt)
        qkv = jax.lax.dot_general(
            h, wqkv_ref[i], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dt) + bqkv_ref[i:i + 1, :].astype(dt)   # (M, 3*HD)
        qkv3 = qkv.reshape(NB, T, 3 * HD)
        outs = []
        if packed:
            # hpp = 128//Dh heads per full-lane group pane; qk-norm
            # params arrive pre-tiled to (L, 128) (pallas_packed docs)
            for gg in range(HD // 128):
                q = qkv3[:, :, gg * 128:(gg + 1) * 128]
                k = qkv3[:, :, HD + gg * 128:HD + (gg + 1) * 128]
                v = qkv3[:, :, 2 * HD + gg * 128:2 * HD + (gg + 1) * 128]
                if qk_norm:
                    q = pk.ln_blocks_fwd32(
                        q, qns_ref[i:i + 1, :], qnb_ref[i:i + 1, :],
                        Dh)[0].astype(dt)
                    k = pk.ln_blocks_fwd32(
                        k, kns_ref[i:i + 1, :], knb_ref[i:i + 1, :],
                        Dh)[0].astype(dt)
                o = pk.group_attn_fwd(
                    q, k, v, dh=Dh, scale=scale, dt=dt,
                    bias=kbias if use_mask else None)
                outs.append(o.astype(dt))
        else:
            for hh in range(H):
                q = qkv3[:, :, hh * Dh:(hh + 1) * Dh]
                k = qkv3[:, :, HD + hh * Dh:HD + (hh + 1) * Dh]
                v = qkv3[:, :, 2 * HD + hh * Dh:2 * HD + (hh + 1) * Dh]
                if qk_norm:
                    q = _ln(q, qns_ref, qnb_ref, i, dt)
                    k = _ln(k, kns_ref, knb_ref, i, dt)
                s = jax.lax.dot_general(
                    q, k, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ) * scale                                 # (NB, T, T) f32
                if use_mask:
                    s = s + kbias
                m = jnp.max(s, axis=-1, keepdims=True)
                e = jnp.exp(s - m)
                denom = jnp.sum(e, axis=-1, keepdims=True)
                o = jax.lax.dot_general(
                    e.astype(dt), v, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
                outs.append((o / denom).astype(dt))       # (NB, T, Dh)
        attn = jnp.concatenate(outs, axis=-1).reshape(M, HD)
        attn = jax.lax.dot_general(
            attn, wo_ref[i], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dt) + bo_ref[i:i + 1, :].astype(dt)
        x = x + drop(attn, 2 * i, lbytes[0])
        # ---- FFN sublayer (pre-LN) --------------------------------------
        h = _ln(x, ln2s_ref, ln2b_ref, i, dt)
        h = jax.lax.dot_general(
            h, w1_ref[i], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dt) + b1_ref[i:i + 1, :].astype(dt)
        h = jnp.maximum(h, 0)
        h = jax.lax.dot_general(
            h, w2_ref[i], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dt) + b2_ref[i:i + 1, :].astype(dt)
        x = x + drop(h, 2 * i + 1, lbytes[1])

    if final_ln:
        x = _ln(x, lnfs_ref, lnfb_ref, 0, dt)
    o_ref[:] = x.reshape(NB, T, d).astype(o_ref.dtype)


def _batches_per_cell(B, T, d, dff, H, itemsize, extra_per_batch=0):
    """Whole batch elements per grid cell: activation panes within budget
    (weights are resident and budgeted separately by Mosaic).
    ``extra_per_batch``: additional bytes per batch element (e.g. the
    train path's per-layer saved-inputs block and dropout bits)."""
    per_batch = (
        6 * T * d * itemsize        # x, h, attn-out, concat panes
        + T * 3 * d * itemsize      # qkv pane
        + T * dff * itemsize        # ffn hidden
        + 2 * T * T * 4             # one head's s, e in f32
        + extra_per_batch
    )
    nb = max(1, ACT_VMEM_BUDGET // max(per_batch, 1))
    while nb > 1 and B % nb:
        nb -= 1
    return nb


def fused_encoder_stack(
    x: jnp.ndarray,                     # (B, T, d) compute dtype
    key_mask: Optional[jnp.ndarray],    # (B, T) bool, True = attend
    w: dict,                            # stacked weights, see stack_weights
    *,
    num_heads: int,
    qk_norm: bool = False,
) -> jnp.ndarray:
    """Run the full pre-LN encoder stack in one pallas call.

    ``w`` is the dict produced by :func:`stack_encoder_weights`. Falls back
    are the caller's job (infer/fast_encode.py checks config support).
    """
    B, T, d = x.shape
    if T > MAX_FUSED_LEN:
        raise ValueError(f"T={T} exceeds fused limit {MAX_FUSED_LEN}")
    L, _, three_hd = w["wqkv"].shape
    H = num_heads
    Dh = d // H
    dff = w["w1"].shape[2]
    assert three_hd == 3 * H * Dh
    # packed needs 8-aligned sublane score chunks (T % 8); other small-head
    # geometries keep the per-head loop (correct, lane-padded)
    packed = pk.packed_supported(d, H) and T % 8 == 0
    if packed:
        w = {**w, **{k: pk.tile_heads(w[k], 128 // Dh)
                     for k in ("qns", "qnb", "kns", "knb")}}
    NB = _batches_per_cell(B, T, d, dff, H, x.dtype.itemsize)
    use_mask = key_mask is not None
    if use_mask:
        bias = jnp.where(key_mask, 0.0, NEG_INF).astype(
            jnp.float32)[:, None, :]              # (B, 1, T)
        spec_bias = pl.BlockSpec((NB, 1, T), lambda g: (g, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        bias = jnp.zeros((1, 1), jnp.float32)
        spec_bias = pl.BlockSpec((1, 1), lambda g: (0, 0),
                                 memory_space=pltpu.VMEM)

    spec_x = pl.BlockSpec((NB, T, d), lambda g: (g, 0, 0),
                          memory_space=pltpu.VMEM)

    def wspec(arr):
        # whole-array block, constant index map -> fetched once, resident
        zeros = (0,) * arr.ndim
        return pl.BlockSpec(arr.shape, lambda g, _z=zeros: _z,
                            memory_space=pltpu.VMEM)

    worder = ["ln1s", "ln1b", "wqkv", "bqkv", "qns", "qnb", "kns", "knb",
              "wo", "bo", "ln2s", "ln2b", "w1", "b1", "w2", "b2",
              "lnfs", "lnfb"]
    wargs = [w[k] for k in worder]

    flops = 2 * B * T * L * (4 * d * d + 2 * d * dff) \
        + 2 * 2 * B * H * T * T * Dh * L
    return pl.pallas_call(
        functools.partial(
            _stack_kernel, L=L, H=H, Dh=Dh, scale=1.0 / (Dh ** 0.5),
            use_mask=use_mask, qk_norm=qk_norm, packed=packed),
        grid=(B // NB,),
        in_specs=[spec_x, spec_bias] + [wspec(a) for a in wargs],
        out_specs=spec_x,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=_use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * x.size * x.dtype.itemsize
            + sum(a.size * a.dtype.itemsize for a in wargs),
            transcendentals=B * H * T * T * L,
        ),
    )(x, bias, *wargs)


def stack_encoder_weights(enc_params: dict, *, num_layers: int,
                          compute_dtype) -> dict:
    """Flax ``params['encoder']`` subtree -> stacked kernel operands.

    Matmul weights are stacked (L, ...) and cast to the compute dtype;
    LN scales/biases and matmul biases stay f32 (they're added after the
    f32-accumulating dots / inside f32 LN math).
    """
    dt = compute_dtype
    f32 = jnp.float32

    def layers(path):
        out = []
        for i in range(num_layers):
            node = enc_params[f"layer_{i}"]
            for p in path:
                node = node[p]
            out.append(node)
        return out

    def stk(path, dtype):
        return jnp.stack([jnp.asarray(a, dtype) for a in layers(path)])

    d = enc_params["layer_0"]["ln1"]["scale"].shape[0]
    qkv_k = []
    qkv_b = []
    for i in range(num_layers):
        sa = enc_params[f"layer_{i}"]["self_attn"]
        ks = [sa[n]["kernel"].reshape(d, -1) for n in ("query", "key",
                                                       "value")]
        bs = [sa[n]["bias"].reshape(-1) for n in ("query", "key", "value")]
        qkv_k.append(jnp.concatenate(ks, axis=-1))
        qkv_b.append(jnp.concatenate(bs, axis=-1))
    w = {
        "ln1s": stk(("ln1", "scale"), f32),
        "ln1b": stk(("ln1", "bias"), f32),
        "wqkv": jnp.stack(qkv_k).astype(dt),
        "bqkv": jnp.stack(qkv_b).astype(f32),
        "wo": stk(("self_attn", "out", "kernel"), dt).reshape(
            num_layers, -1, d),
        "bo": stk(("self_attn", "out", "bias"), f32),
        "ln2s": stk(("ln2", "scale"), f32),
        "ln2b": stk(("ln2", "bias"), f32),
        "w1": stk(("ffn", "in", "kernel"), dt),
        "b1": stk(("ffn", "in", "bias"), f32),
        "w2": stk(("ffn", "out", "kernel"), dt),
        "b2": stk(("ffn", "out", "bias"), f32),
    }
    sa0 = enc_params["layer_0"]["self_attn"]
    if "q_norm" in sa0:
        w["qns"] = stk(("self_attn", "q_norm", "scale"), f32)
        w["qnb"] = stk(("self_attn", "q_norm", "bias"), f32)
        w["kns"] = stk(("self_attn", "k_norm", "scale"), f32)
        w["knb"] = stk(("self_attn", "k_norm", "bias"), f32)
    else:
        # dummy (L, head_dim) panes — never read when qk_norm is off
        head_dim = sa0["query"]["kernel"].shape[-1]
        w["qns"] = jnp.ones((num_layers, head_dim), f32)
        w["qnb"] = jnp.zeros((num_layers, head_dim), f32)
        w["kns"] = jnp.ones((num_layers, head_dim), f32)
        w["knb"] = jnp.zeros((num_layers, head_dim), f32)
    w["lnfs"] = jnp.asarray(enc_params["ln_out"]["scale"], f32)[None, :]
    w["lnfb"] = jnp.asarray(enc_params["ln_out"]["bias"], f32)[None, :]
    return w
