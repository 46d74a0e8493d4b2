"""Fast batched greedy decode: one kernel per AR step.

Serving-engine companion to infer/fast_encode.py — a pure-function decode
loop over the flax param pytree where the whole decoder stack runs as ONE
pallas call per step (ops/pallas_decode_stack.py) instead of ~100 XLA ops.
Token semantics are identical to infer.decode.make_token_decoder (SOS
start, PAD/SOS logits masked, EOS finishes a row, finished rows emit PAD,
while_loop early exit) — pinned by tests/test_fast_decode.py.

Supported: token mode, pre-LN, attn/mean bottleneck (fixed-size memory).
``make_fast_token_decoder`` falls back to the composed decoder otherwise.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from sketchformer_tpu.data.tokenizer import EOS_ID, PAD_ID, SOS_ID
from sketchformer_tpu.models.embeddings import sinusoidal_position_encoding
from sketchformer_tpu.models.sketchformer import Sketchformer
from sketchformer_tpu.ops.pallas_decode_stack import (
    fused_decode_step,
    precompute_cross_kv,
)
from sketchformer_tpu.ops.pallas_decoder_train import stack_decoder_weights

NEG_INF = -1e9


def fast_decode_support(model: Sketchformer, backend: str = None):
    """(supported, reason-declined) for the fused decode-step engine.

    ``backend`` overrides ``jax.default_backend()`` (tests)."""
    cfg = model.config
    if cfg.use_continuous:
        return False, "continuous/MDN mode"
    if not cfg.norm_first:
        return False, "post-LN config"
    if cfg.bottleneck_mode not in ("attn", "mean"):
        return False, f"bottleneck_mode={cfg.bottleneck_mode!r}"
    if cfg.d_model % cfg.num_heads:
        return False, "d_model not divisible by num_heads"
    backend = backend or jax.default_backend()
    if backend == "tpu":
        # the kernel's head fold is a (NB, H*Dh) -> (NB*H, Dh) minor-dim
        # reshape — Mosaic only supports it at full 128-lane widths
        # (d128/H4 -> Dh=32 fails with "unsupported shape cast"); the
        # composed path serves small-head configs
        if (cfg.d_model // cfg.num_heads) % 128:
            return False, (
                f"head_dim={cfg.d_model // cfg.num_heads} < 128 (Mosaic "
                "head-fold reshape needs full-lane heads)")
    return True, ""


def supports_fast_decode(model: Sketchformer) -> bool:
    return fast_decode_support(model)[0]


def _decode_ids_from_memory(model, params, memory, B, T):
    cfg = model.config
    dt = cfg.compute_dtype
    L, H = cfg.num_layers, cfg.num_heads
    d = cfg.d_model
    Dh = d // H
    Tmax = T + Sketchformer.CACHE_PAD  # spare slots (TPU NaN-bug zone)
    w = stack_decoder_weights(params["decoder"], num_layers=L,
                              compute_dtype=dt)
    ck, cv = precompute_cross_kv(memory, w, num_heads=H,
                                 qk_norm=cfg.qk_norm)
    emb = params["dec_embed"]["embed"]["embedding"].astype(dt)
    pos_table = jnp.asarray(
        sinusoidal_position_encoding(cfg.max_len, d), dt)
    sqrt_d = jnp.asarray(np.sqrt(d), dt)
    hw = params["out_head"]["proj"]["kernel"].astype(dt)
    hb = params["out_head"]["proj"]["bias"].astype(jnp.float32)

    kc0 = jnp.zeros((L, B * H, Tmax, Dh), dt)
    vc0 = jnp.zeros_like(kc0)
    prev0 = jnp.full((B,), SOS_ID, jnp.int32)
    fin0 = jnp.zeros((B,), bool)
    out0 = jnp.full((B, T), PAD_ID, jnp.int32)

    def step(kc, vc, prev, finished, t):
        x = emb[prev] * sqrt_d + pos_table[t]          # (B, d)
        h, kn, vn = fused_decode_step(
            x, kc, vc, ck, cv, w, t, num_heads=H, qk_norm=cfg.qk_norm)
        kc = jax.lax.dynamic_update_slice(
            kc, kn[:, :, None, :], (0, 0, t, 0))
        vc = jax.lax.dynamic_update_slice(
            vc, vn[:, :, None, :], (0, 0, t, 0))
        logits = (h @ hw).astype(jnp.float32) + hb     # (B, V)
        logits = logits.at[:, PAD_ID].set(NEG_INF).at[:, SOS_ID].set(
            NEG_INF)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        nxt = jnp.where(finished, PAD_ID, nxt)
        finished = jnp.logical_or(finished, nxt == EOS_ID)
        return kc, vc, nxt, finished

    def cond(carry):
        _, _, _, finished, t, _ = carry
        return jnp.logical_and(t < T, jnp.logical_not(finished.all()))

    def body(carry):
        kc, vc, prev, finished, t, out = carry
        kc, vc, nxt, finished = step(kc, vc, prev, finished, t)
        out = jax.lax.dynamic_update_slice(out, nxt[:, None], (0, t))
        return (kc, vc, nxt, finished, t + 1, out)

    _, _, _, _, _, ids = jax.lax.while_loop(
        cond, body, (kc0, vc0, prev0, fin0, jnp.int32(0), out0))
    return ids


def make_fast_token_decoder(
    model: Sketchformer, max_len: Optional[int] = None,
) -> Callable:
    """Jitted ``decode(params, enc) -> (B, T) int32`` — drop-in for
    infer.decode.make_token_decoder; composed fallback for unsupported
    configs."""
    cfg = model.config
    if not supports_fast_decode(model):
        from sketchformer_tpu.infer.decode import make_token_decoder

        return make_token_decoder(model, max_len=max_len)
    T = max_len or cfg.max_len
    if T > cfg.max_len:
        raise ValueError(f"max_len {T} exceeds model max_len {cfg.max_len}")

    def decode(params, enc):
        B = enc.shape[0]
        _, memory, _ = model.apply(
            {"params": params}, enc, method=Sketchformer.encode)
        return _decode_ids_from_memory(model, params, memory, B, T)

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
