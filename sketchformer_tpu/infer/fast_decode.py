"""Fast batched greedy decode: K whole AR steps per kernel call.

Serving-engine companion to infer/fast_encode.py — a pure-function decode
loop over the flax param pytree where K consecutive greedy steps (decoder
stack + vocab head + argmax + EOS logic) run as ONE pallas call
(ops/pallas_decode_loop.py), amortizing cache refetch, weight fetch, and
launch overhead K-fold over round 2's one-kernel-per-step engine
(ops/pallas_decode_stack.py, kept for probes/ablation). Token semantics
are identical to infer.decode.make_token_decoder (SOS start, PAD/SOS
logits masked, EOS finishes a row, finished rows emit PAD, while_loop
early exit at chunk granularity) — pinned by tests/test_fast_decode.py.

Supported: token AND continuous/MDN modes, pre-LN, attn/mean bottleneck
(fixed-size memory), ANY head geometry with d_model % num_heads == 0:
full-lane heads (Dh == 128) run the row-folded kernels; smaller heads —
including the reference H=8/Dh=32 geometry (SURVEY.md §2) — run the
lane-PACKED kernels (ops/pallas_decode_packed.py), on TPU and interpret
alike. ``make_fast_token_decoder`` falls back to the composed decoder
otherwise.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from sketchformer_tpu.data.tokenizer import EOS_ID, PAD_ID, SOS_ID
from sketchformer_tpu.models.embeddings import sinusoidal_position_encoding
from sketchformer_tpu.models.sketchformer import Sketchformer
from sketchformer_tpu.ops.pallas_decode_loop import (
    DEFAULT_STEPS_PER_CALL,
    fused_decode_chunk,
)
from sketchformer_tpu.ops.pallas_decode_stack import precompute_cross_kv
from sketchformer_tpu.ops.pallas_decoder_train import stack_decoder_weights

NEG_INF = -1e9


def fast_cont_decode_support(model: Sketchformer, backend: str = None,
                             greedy: bool = True):
    """(supported, reason-declined) for the fused MDN chunk engine."""
    cfg = model.config
    if not cfg.use_continuous:
        return False, "token mode (use fast_decode_support)"
    if not greedy:
        return False, "temperature sampling (greedy only in-kernel)"
    return _structural_support(cfg, backend)


def fast_decode_support(model: Sketchformer, backend: str = None):
    """(supported, reason-declined) for the fused decode-step engine.

    ``backend`` overrides ``jax.default_backend()`` (tests)."""
    cfg = model.config
    if cfg.use_continuous:
        return False, "continuous/MDN mode"
    return _structural_support(cfg, backend)


def _structural_support(cfg, backend=None):
    # NOTE: head geometry is no longer a gate anywhere. Full-lane heads
    # (Dh == 128) run the row-folded chunk kernels; any other
    # d_model % num_heads == 0 geometry runs the lane-PACKED kernels
    # (ops/pallas_decode_packed.py — the folded kernels' sub-lane head
    # fold is what Mosaic rejects at Dh < 128).
    del backend
    if not cfg.norm_first:
        return False, "post-LN config"
    if cfg.bottleneck_mode not in ("attn", "mean"):
        return False, f"bottleneck_mode={cfg.bottleneck_mode!r}"
    if cfg.d_model % cfg.num_heads:
        return False, "d_model not divisible by num_heads"
    return True, ""


def supports_fast_decode(model: Sketchformer) -> bool:
    return fast_decode_support(model)[0]


def _decode_ids_from_memory(model, params, memory, B, T,
                            steps_per_call: Optional[int] = None):
    cfg = model.config
    dt = cfg.compute_dtype
    L, H = cfg.num_layers, cfg.num_heads
    d = cfg.d_model
    Dh = d // H
    K = steps_per_call or min(DEFAULT_STEPS_PER_CALL, T)
    Tp = ((T + K - 1) // K) * K            # chunk-aligned horizon
    Tmax = Tp + Sketchformer.CACHE_PAD     # spare slots (TPU NaN-bug zone)
    if Tmax > 128:                         # kernel streams 128-row tiles
        Tmax = ((Tmax + 127) // 128) * 128
    w = stack_decoder_weights(params["decoder"], num_layers=L,
                              compute_dtype=dt)
    # small heads (Dh < 128) use the lane-PACKED kernel — heads stay
    # interleaved in lanes, caches are (L, B, Tmax, d); full-lane heads
    # use the row-folded kernel with (L, B*H, Tmax, Dh) caches
    packed = Dh != 128
    if packed:
        from sketchformer_tpu.ops.pallas_decode_packed import (
            fused_decode_chunk_packed,
            precompute_cross_kv_packed,
            stack_packed_qk_norms,
        )

        w = stack_packed_qk_norms(w, H)
        ck, cv = precompute_cross_kv_packed(memory, w, num_heads=H,
                                            qk_norm=cfg.qk_norm)
        kc0 = jnp.zeros((L, B, Tmax, d), dt)
        chunk_fn = fused_decode_chunk_packed
    else:
        ck, cv = precompute_cross_kv(memory, w, num_heads=H,
                                     qk_norm=cfg.qk_norm)
        kc0 = jnp.zeros((L, B * H, Tmax, Dh), dt)
        chunk_fn = fused_decode_chunk
    emb = params["dec_embed"]["embed"]["embedding"].astype(dt)
    pos_table = jnp.asarray(
        sinusoidal_position_encoding(max(cfg.max_len, Tp), d), dt)
    hw = params["out_head"]["proj"]["kernel"].astype(dt)
    hb = params["out_head"]["proj"]["bias"].astype(jnp.float32)

    vc0 = jnp.zeros_like(kc0)
    prev0 = jnp.full((B, 1), SOS_ID, jnp.int32)
    fin0 = jnp.zeros((B, 1), jnp.int32)
    out0 = jnp.full((B, Tp), PAD_ID, jnp.int32)

    def cond(carry):
        _, _, _, finished, t, _ = carry
        return jnp.logical_and(t < Tp, jnp.logical_not(
            (finished != 0).all()))

    def body(carry):
        kc, vc, prev, finished, t, out = carry
        pos_chunk = jax.lax.dynamic_slice(pos_table, (t, 0), (K, d))
        ids, finished, kn, vn = chunk_fn(
            prev, finished, kc, vc, ck, cv, emb, pos_chunk, hw, hb, w, t,
            num_heads=H, qk_norm=cfg.qk_norm,
            pad_id=PAD_ID, sos_id=SOS_ID, eos_id=EOS_ID)
        kc = jax.lax.dynamic_update_slice(kc, kn, (0, 0, t, 0))
        vc = jax.lax.dynamic_update_slice(vc, vn, (0, 0, t, 0))
        out = jax.lax.dynamic_update_slice(out, ids, (0, t))
        return (kc, vc, ids[:, K - 1:K], finished, t + K, out)

    _, _, _, _, _, ids = jax.lax.while_loop(
        cond, body, (kc0, vc0, prev0, fin0, jnp.int32(0), out0))
    return ids[:, :T]


def make_fast_token_decoder(
    model: Sketchformer, max_len: Optional[int] = None,
    steps_per_call: Optional[int] = None,
) -> Callable:
    """Jitted ``decode(params, enc) -> (B, T) int32`` — drop-in for
    infer.decode.make_token_decoder; composed fallback for unsupported
    configs.

    ``steps_per_call`` (chunk K) bounds early-exit granularity: the
    while_loop can only stop on a K boundary, so on a TRAINED model
    decoding typical-length sketches a smaller K exits sooner at the cost
    of more kernel dispatches (measured trade-off in
    docs/PERF_DECODE.md "realistic workload")."""
    cfg = model.config
    if not supports_fast_decode(model):
        from sketchformer_tpu.infer.decode import make_token_decoder

        if steps_per_call is not None:
            import warnings

            warnings.warn(
                "steps_per_call has no effect on the composed decode "
                "fallback (config unsupported by the fused kernel); "
                "early exit there is per-step already", stacklevel=2)
        return make_token_decoder(model, max_len=max_len, fast=False)
    T = max_len or cfg.max_len
    if T > cfg.max_len:
        raise ValueError(f"max_len {T} exceeds model max_len {cfg.max_len}")

    def decode(params, enc):
        B = enc.shape[0]
        _, memory, _ = model.apply(
            {"params": params}, enc, method=Sketchformer.encode)
        return _decode_ids_from_memory(model, params, memory, B, T,
                                       steps_per_call=steps_per_call)

    return jax.jit(decode)


def make_fast_token_decoder_from_z(
    model: Sketchformer, max_len: Optional[int] = None,
) -> Callable:
    """Jitted ``decode(params, z) -> (B, T) int32`` from stored embeddings."""
    cfg = model.config
    if not supports_fast_decode(model):
        from sketchformer_tpu.infer.decode import make_token_decoder_from_z

        return make_token_decoder_from_z(model, max_len=max_len)
    T = max_len or cfg.max_len
    if T > cfg.max_len:
        raise ValueError(f"max_len {T} exceeds model max_len {cfg.max_len}")

    def decode(params, z):
        memory = model.apply(
            {"params": params}, z, method=Sketchformer.memory_from_z)
        return _decode_ids_from_memory(model, params, memory, z.shape[0], T)

    return jax.jit(decode)


# ---------------------------------------------------------------------------
# continuous (MDN) greedy engine — SURVEY §0 regime 2, VERDICT r2 item 5
# ---------------------------------------------------------------------------


def _decode_cont_from_memory_fast(model, params, memory, B, T,
                                  steps_per_call: Optional[int] = None):
    from sketchformer_tpu.ops.pallas_decode_loop import (
        fused_decode_cont_chunk)

    cfg = model.config
    dt = cfg.compute_dtype
    L, H = cfg.num_layers, cfg.num_heads
    d = cfg.d_model
    Dh = d // H
    K = steps_per_call or min(DEFAULT_STEPS_PER_CALL, T)
    Tp = ((T + K - 1) // K) * K
    Tmax = Tp + Sketchformer.CACHE_PAD
    if Tmax > 128:                         # kernel streams 128-row tiles
        Tmax = ((Tmax + 127) // 128) * 128
    w = stack_decoder_weights(params["decoder"], num_layers=L,
                              compute_dtype=dt)
    packed = Dh != 128                     # see _decode_ids_from_memory
    if packed:
        from sketchformer_tpu.ops.pallas_decode_packed import (
            fused_decode_cont_chunk_packed,
            precompute_cross_kv_packed,
            stack_packed_qk_norms,
        )

        w = stack_packed_qk_norms(w, H)
        ck, cv = precompute_cross_kv_packed(memory, w, num_heads=H,
                                            qk_norm=cfg.qk_norm)
        kc0 = jnp.zeros((L, B, Tmax, d), dt)
        chunk_fn = fused_decode_cont_chunk_packed
    else:
        ck, cv = precompute_cross_kv(memory, w, num_heads=H,
                                     qk_norm=cfg.qk_norm)
        kc0 = jnp.zeros((L, B * H, Tmax, Dh), dt)
        chunk_fn = fused_decode_cont_chunk
    in_w = params["dec_embed"]["proj"]["kernel"].astype(dt)
    in_b = params["dec_embed"]["proj"]["bias"].astype(jnp.float32)
    pos_table = jnp.asarray(
        sinusoidal_position_encoding(max(cfg.max_len, Tp), d), dt)
    hw = params["out_head"]["proj"]["kernel"].astype(dt)
    hb = params["out_head"]["proj"]["bias"].astype(jnp.float32)

    vc0 = jnp.zeros_like(kc0)
    # SOS row: (0, 0, pen-down one-hot) — infer.decode's start row
    prev0 = jnp.zeros((B, 5), jnp.float32).at[:, 3].set(1.0)
    fin0 = jnp.zeros((B, 1), jnp.int32)
    xy0 = jnp.zeros((B, Tp, 2), jnp.float32)
    pen0 = jnp.full((B, Tp), 2, jnp.int32)          # PEN_END padding
    valid0 = jnp.zeros((B, Tp), jnp.int32)

    def cond(carry):
        _, _, _, finished, t, _, _, _ = carry
        return jnp.logical_and(t < Tp, jnp.logical_not(
            (finished != 0).all()))

    def body(carry):
        kc, vc, prev, finished, t, xy_buf, pen_buf, valid_buf = carry
        pos_chunk = jax.lax.dynamic_slice(pos_table, (t, 0), (K, d))
        xy, pen, valid, finished, kn, vn = chunk_fn(
            prev, finished, kc, vc, ck, cv, in_w, in_b, pos_chunk,
            hw, hb, w, t, num_heads=H, num_mixtures=cfg.num_mixtures,
            qk_norm=cfg.qk_norm)
        kc = jax.lax.dynamic_update_slice(kc, kn, (0, 0, t, 0))
        vc = jax.lax.dynamic_update_slice(vc, vn, (0, 0, t, 0))
        xy_buf = jax.lax.dynamic_update_slice(xy_buf, xy, (0, t, 0))
        pen_buf = jax.lax.dynamic_update_slice(pen_buf, pen, (0, t))
        valid_buf = jax.lax.dynamic_update_slice(valid_buf, valid, (0, t))
        pen_oh = jax.nn.one_hot(pen[:, K - 1], 3, dtype=jnp.float32)
        prev = jnp.concatenate([xy[:, K - 1, :], pen_oh], axis=-1)
        return (kc, vc, prev, finished, t + K, xy_buf, pen_buf, valid_buf)

    _, _, _, _, _, xy, pen, valid = jax.lax.while_loop(
        cond, body, (kc0, vc0, prev0, fin0, jnp.int32(0), xy0, pen0,
                     valid0))
    return xy[:, :T], pen[:, :T], valid[:, :T].astype(bool)


def make_fast_cont_decoder(
    model: Sketchformer, max_len: Optional[int] = None,
    temperature: float = 0.0, early_exit: bool = True,
) -> Callable:
    """Jitted greedy ``decode(params, enc, enc_mask, rng) -> (xy, pen,
    valid)`` on the fused MDN chunk engine — drop-in for
    infer.decode.make_cont_decoder; composed fallback otherwise."""
    cfg = model.config
    greedy = temperature <= 0.0
    if not fast_cont_decode_support(model, greedy=greedy)[0]:
        from sketchformer_tpu.infer.decode import make_cont_decoder

        return make_cont_decoder(model, max_len=max_len,
                                 temperature=temperature,
                                 early_exit=early_exit)
    T = max_len or cfg.max_len
    if T > cfg.max_len:
        raise ValueError(f"max_len {T} exceeds model max_len {cfg.max_len}")

    def decode(params, enc, enc_mask, rng):
        del rng  # greedy: deterministic
        B = enc.shape[0]
        _, memory, _ = model.apply(
            {"params": params}, enc, enc_mask, method=Sketchformer.encode)
        return _decode_cont_from_memory_fast(model, params, memory, B, T)

    return jax.jit(decode)


def make_fast_cont_decoder_from_z(
    model: Sketchformer, max_len: Optional[int] = None,
    temperature: float = 0.0, early_exit: bool = True,
) -> Callable:
    cfg = model.config
    greedy = temperature <= 0.0
    if not fast_cont_decode_support(model, greedy=greedy)[0]:
        from sketchformer_tpu.infer.decode import make_cont_decoder_from_z

        return make_cont_decoder_from_z(model, max_len=max_len,
                                        temperature=temperature,
                                        early_exit=early_exit)
    T = max_len or cfg.max_len
    if T > cfg.max_len:
        raise ValueError(f"max_len {T} exceeds model max_len {cfg.max_len}")

    def decode(params, z, rng):
        del rng
        memory = model.apply(
            {"params": params}, z, method=Sketchformer.memory_from_z)
        return _decode_cont_from_memory_fast(
            model, params, memory, z.shape[0], T)

    return jax.jit(decode)
