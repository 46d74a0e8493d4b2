"""Batched autoregressive reconstruction with KV-cached greedy decode.

Capability parity with the reference's ``predict`` path (reference:
models/sketchformer.py — greedy AR decode that RE-RUNS the full decoder
over the growing prefix each step, O(T^2·L) attention, no cache). Here the
whole decode is ONE compiled program: a ``lax.scan`` over steps where each
step embeds a single position, runs the decoder with the static-shape KV
cache (Pallas decode-attention kernel on TPU), and greedily emits the next
token / MDN mode. EOS/pen-end handling is per-row masking inside the scan,
so a whole batch decodes together regardless of individual stop times.

Both entry points exist for tokens and continuous mode, and both support
decoding from raw sketches OR from stored bottleneck embeddings
(BASELINE.json config 3: "greedy KV-cached decode from bottleneck
embedding").
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sketchformer_tpu.data.pipeline import PEN_END
from sketchformer_tpu.data.tokenizer import EOS_ID, PAD_ID, SOS_ID
from sketchformer_tpu.models.sketchformer import Sketchformer
from sketchformer_tpu.ops import mdn

NEG_INF = -1e9


def _check_len(cfg, max_len):
    if max_len > cfg.max_len:
        raise ValueError(
            f"decode max_len={max_len} exceeds model max_len={cfg.max_len} "
            "(posenc table and KV cache are sized by the model config)")
    return max_len


def _build_cache(model, params, batch_size, memory, memory_mask,
                 cache_pad=None):
    _, vars_ = model.apply(
        {"params": params}, batch_size, memory, memory_mask, cache_pad,
        method=Sketchformer.init_cache, mutable=["cache"])
    return vars_["cache"]


def _memory_from_z(model, params, z):
    return model.apply(
        {"params": params}, z, method=Sketchformer.memory_from_z)


# ---------------------------------------------------------------------------
# token mode
# ---------------------------------------------------------------------------


def make_token_decoder(
    model: Sketchformer, max_len: Optional[int] = None,
    early_exit: bool = True, cache_pad: Optional[int] = None,
    fast: bool = True, steps_per_call: Optional[int] = None,
) -> Callable:
    """Returns jitted ``decode(params, enc) -> (B, max_len) int32 ids``.

    ``fast=True`` (default) routes supported configs through the whole-
    stack decode-step kernel (infer/fast_decode.py — one pallas call per
    AR step instead of ~100 XLA ops; identical ids, pinned by
    tests/test_fast_decode.py). Passing ``early_exit=False`` or
    ``cache_pad`` selects the composed path explicitly (the equivalence-
    test oracle).

    Emitted rows are ``[t_1 .. EOS PAD ...]`` (SOS stripped), matching the
    pipeline's ``dec_tgt`` layout so tokenizer.decode applies directly.

    ``early_exit=True`` (default) decodes with a ``lax.while_loop`` that
    stops the moment every row has emitted EOS — a batch of typical-length
    sketches no longer pays max_len steps of kernel launches. The fixed-T
    ``lax.scan`` variant remains for equivalence testing (outputs are
    identical: unreached columns are PAD either way).
    """
    cfg = model.config
    T = _check_len(cfg, max_len or cfg.max_len)
    if fast and early_exit and cache_pad is None:
        from sketchformer_tpu.infer.fast_decode import (
            fast_decode_support,
            make_fast_token_decoder,
        )
        from sketchformer_tpu.utils.engines import note_engine

        ok, why = fast_decode_support(model)
        if ok:
            packed = cfg.d_model // cfg.num_heads != 128
            note_engine("decode", "fused-chunk-kernel-packed" if packed
                        else "fused-chunk-kernel")
            return make_fast_token_decoder(model, max_len=T,
                                           steps_per_call=steps_per_call)
        note_engine("decode", "composed", why)

    if steps_per_call is not None:
        import warnings

        warnings.warn(
            "steps_per_call applies only to the fused decode kernel; the "
            "composed path already early-exits per step, so the knob has "
            "no effect here", stacklevel=2)

    def decode(params, enc):
        B = enc.shape[0]
        _, memory, memory_mask = model.apply(
            {"params": params}, enc, method=Sketchformer.encode)
        return _decode_tokens_from_memory(
            model, params, memory, memory_mask, B, T, early_exit, cache_pad)

    return jax.jit(decode)


def make_token_decoder_from_z(
    model: Sketchformer, max_len: Optional[int] = None,
    early_exit: bool = True, fast: bool = True,
) -> Callable:
    """Returns jitted ``decode(params, z) -> ids`` from stored embeddings."""
    cfg = model.config
    T = _check_len(cfg, max_len or cfg.max_len)
    if fast and early_exit:
        from sketchformer_tpu.infer.fast_decode import (
            make_fast_token_decoder_from_z,
            supports_fast_decode,
        )

        if supports_fast_decode(model):
            return make_fast_token_decoder_from_z(model, max_len=T)

    def decode(params, z):
        memory = _memory_from_z(model, params, z)
        return _decode_tokens_from_memory(
            model, params, memory, None, z.shape[0], T, early_exit)

    return jax.jit(decode)


def _decode_tokens_from_memory(
    model, params, memory, memory_mask, B, T, early_exit=True,
    cache_pad=None,
):
    cache = _build_cache(model, params, B, memory, memory_mask, cache_pad)

    def step(cache, prev, finished, t):
        out, upd = model.apply(
            {"params": params, "cache": cache},
            prev[:, None], memory, memory_mask, t,
            method=Sketchformer.decode_step, mutable=["cache"])
        logits = out[:, 0]
        logits = logits.at[:, PAD_ID].set(NEG_INF).at[:, SOS_ID].set(NEG_INF)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        nxt = jnp.where(finished, PAD_ID, nxt)
        new_finished = jnp.logical_or(finished, nxt == EOS_ID)
        return upd["cache"], nxt, new_finished

    prev0 = jnp.full((B,), SOS_ID, jnp.int32)
    fin0 = jnp.zeros((B,), bool)

    if not early_exit:
        def body(carry, t):
            cache, prev, finished = carry
            cache, nxt, finished = step(cache, prev, finished, t)
            return (cache, nxt, finished), nxt

        _, ids = jax.lax.scan(body, (cache, prev0, fin0), jnp.arange(T))
        return ids.T  # (B, T)

    out0 = jnp.full((B, T), PAD_ID, jnp.int32)

    def cond(carry):
        _, _, finished, t, _ = carry
        return jnp.logical_and(t < T, jnp.logical_not(finished.all()))

    def body(carry):
        cache, prev, finished, t, out = carry
        cache, nxt, finished = step(cache, prev, finished, t)
        out = jax.lax.dynamic_update_slice(out, nxt[:, None], (0, t))
        return (cache, nxt, finished, t + 1, out)

    _, _, _, _, ids = jax.lax.while_loop(
        cond, body, (cache, prev0, fin0, jnp.int32(0), out0))
    return ids


# ---------------------------------------------------------------------------
# continuous (MDN) mode
# ---------------------------------------------------------------------------


def make_cont_decoder(
    model: Sketchformer,
    max_len: Optional[int] = None,
    temperature: float = 0.0,
    early_exit: bool = True,
) -> Callable:
    """Returns jitted ``decode(params, enc, enc_mask, rng) ->
    (xy (B,T,2), pen (B,T) int32, valid (B,T) bool)``.

    ``temperature == 0`` -> greedy (argmax component mean / pen state).
    ``early_exit`` as in :func:`make_token_decoder` (stops when every row
    has emitted PEN_END). Greedy mode routes through the fused MDN chunk
    kernel when the config supports it (infer/fast_decode.py).
    """
    cfg = model.config
    T = _check_len(cfg, max_len or cfg.max_len)
    greedy = temperature <= 0.0
    if greedy and early_exit:
        from sketchformer_tpu.infer.fast_decode import (
            fast_cont_decode_support,
            make_fast_cont_decoder,
        )
        from sketchformer_tpu.utils.engines import note_engine

        ok, why = fast_cont_decode_support(model, greedy=True)
        if ok:
            packed = cfg.d_model // cfg.num_heads != 128
            note_engine("cont-decode",
                        "fused-chunk-kernel-packed" if packed
                        else "fused-chunk-kernel")
            return make_fast_cont_decoder(model, max_len=T)
        note_engine("cont-decode", "composed", why)

    def decode(params, enc, enc_mask, rng):
        B = enc.shape[0]
        _, memory, memory_mask = model.apply(
            {"params": params}, enc, enc_mask, method=Sketchformer.encode)
        return _decode_cont_from_memory(
            model, params, memory, memory_mask, B, T, rng, greedy,
            temperature, early_exit)

    return jax.jit(decode)


def make_cont_decoder_from_z(
    model: Sketchformer,
    max_len: Optional[int] = None,
    temperature: float = 0.0,
    early_exit: bool = True,
) -> Callable:
    cfg = model.config
    T = _check_len(cfg, max_len or cfg.max_len)
    greedy = temperature <= 0.0

    def decode(params, z, rng):
        memory = _memory_from_z(model, params, z)
        return _decode_cont_from_memory(
            model, params, memory, None, z.shape[0], T, rng, greedy,
            temperature, early_exit)

    return jax.jit(decode)


def _decode_cont_from_memory(
    model, params, memory, memory_mask, B, T, rng, greedy, temperature,
    early_exit=True,
):
    cfg = model.config
    cache = _build_cache(model, params, B, memory, memory_mask)
    sos = jnp.zeros((B, 5), jnp.float32).at[:, 3].set(1.0)

    def step(cache, prev_row, finished, t, step_rng):
        raw, upd = model.apply(
            {"params": params, "cache": cache},
            prev_row[:, None], memory, memory_mask, t,
            method=Sketchformer.decode_step, mutable=["cache"])
        params_t = mdn.split_params(raw[:, 0], cfg.num_mixtures)
        xy, pen = mdn.sample(
            params_t, step_rng, temperature=temperature, greedy=greedy)
        pen = jnp.where(finished, PEN_END, pen).astype(jnp.int32)
        xy = jnp.where(finished[:, None], 0.0, xy)
        new_finished = jnp.logical_or(finished, pen == PEN_END)
        pen_oh = jax.nn.one_hot(pen, 3, dtype=jnp.float32)
        next_row = jnp.concatenate([xy, pen_oh], axis=-1)
        valid = jnp.logical_not(finished)
        return upd["cache"], next_row, new_finished, (xy, pen, valid)

    fin0 = jnp.zeros((B,), bool)
    step_rngs = jax.random.split(rng, T)

    if not early_exit:
        def body(carry, inputs):
            t, step_rng = inputs
            cache, prev_row, finished = carry
            cache, next_row, finished, out = step(
                cache, prev_row, finished, t, step_rng)
            return (cache, next_row, finished), out

        _, (xy, pen, valid) = jax.lax.scan(
            body, (cache, sos, fin0), (jnp.arange(T), step_rngs))
        return (
            xy.transpose(1, 0, 2),
            pen.transpose(1, 0),
            valid.transpose(1, 0),
        )

    xy0 = jnp.zeros((B, T, 2), jnp.float32)
    pen0 = jnp.full((B, T), PEN_END, jnp.int32)
    valid0 = jnp.zeros((B, T), bool)

    def cond(carry):
        _, _, finished, t, _, _, _ = carry
        return jnp.logical_and(t < T, jnp.logical_not(finished.all()))

    def body(carry):
        cache, prev_row, finished, t, xy_buf, pen_buf, valid_buf = carry
        cache, next_row, finished, (xy, pen, valid) = step(
            cache, prev_row, finished, t, step_rngs[t])
        xy_buf = jax.lax.dynamic_update_slice(
            xy_buf, xy[:, None, :], (0, t, 0))
        pen_buf = jax.lax.dynamic_update_slice(
            pen_buf, pen[:, None], (0, t))
        valid_buf = jax.lax.dynamic_update_slice(
            valid_buf, valid[:, None], (0, t))
        return (cache, next_row, finished, t + 1, xy_buf, pen_buf, valid_buf)

    _, _, _, _, xy, pen, valid = jax.lax.while_loop(
        cond, body, (cache, sos, fin0, jnp.int32(0), xy0, pen0, valid0))
    return xy, pen, valid


# ---------------------------------------------------------------------------
# host-side conversion back to stroke-3
# ---------------------------------------------------------------------------


def tokens_to_sketches(tokenizer, ids: np.ndarray) -> list:
    """(B, T) decoded ids -> list of stroke-3 arrays."""
    return [tokenizer.decode(row) for row in np.asarray(ids)]


def cont_to_sketches(
    xy: np.ndarray, pen: np.ndarray, valid: np.ndarray, scale: float = 1.0
) -> list:
    """MDN decode outputs -> list of denormalized stroke-3 arrays."""
    out = []
    for i in range(xy.shape[0]):
        rows = []
        for t in range(xy.shape[1]):
            if not valid[i, t] or pen[i, t] == PEN_END:
                break
            rows.append([xy[i, t, 0] * scale, xy[i, t, 1] * scale,
                         float(pen[i, t])])
        sk = np.asarray(rows, dtype=np.float32).reshape(-1, 3)
        if len(sk):
            sk[-1, 2] = 1.0  # close the final stroke
        out.append(sk)
    return out
