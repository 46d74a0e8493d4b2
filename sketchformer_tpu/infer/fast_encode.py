"""Fast inference engine for embedding extraction.

A pure-function re-implementation of ``Sketchformer.embed`` over the SAME
flax param pytree, with the encoder stack running as ONE fused pallas
kernel (ops/pallas_encoder.py) instead of ~15 HBM round-trips per layer.
Embedding lookup and the bottleneck pooling stay in XLA (a gather and a
(B, Q, T) attention over Q=4 queries — both trivial).

This is the serving-engine pattern: the flax module remains the single
source of truth for training and for parameter structure; this engine is
an execution strategy for the frozen forward pass, pinned to the module by
equivalence tests (tests/test_pallas_encoder.py). Supported configs are
exactly the flagship family (pre-LN, attn/mean/direct bottleneck, token or
continuous input, optional qk-norm); anything else falls back to
``model.apply`` transparently.

Reference parity: the reference's notebook embeds via ``model.encode``
(SURVEY.md §3.4); this is the same capability at TPU speed of light.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from sketchformer_tpu.models.attention import dot_product_attention
from sketchformer_tpu.models.embeddings import sinusoidal_position_encoding
from sketchformer_tpu.models.sketchformer import Sketchformer
from sketchformer_tpu.ops.pallas_encoder import (
    MAX_FUSED_LEN,
    fused_encoder_stack,
    stack_encoder_weights,
)


def fast_path_support(model: Sketchformer):
    """(supported, reason-declined) for the fused embed engine."""
    cfg = model.config
    if not cfg.norm_first:
        return False, "post-LN config"
    if cfg.max_len > MAX_FUSED_LEN:
        return False, f"max_len={cfg.max_len} > fused limit {MAX_FUSED_LEN}"
    if cfg.d_model % cfg.num_heads:
        return False, "d_model not divisible by num_heads"
    return True, ""


def supports_fast_path(model: Sketchformer) -> bool:
    return fast_path_support(model)[0]


def _embed_input(params, cfg, enc, dt):
    """TokenEmbed / ContinuousEmbed forward (models/embeddings.py)."""
    d = cfg.d_model
    table = jnp.asarray(
        sinusoidal_position_encoding(cfg.max_len, d), dt)
    if cfg.use_continuous:
        p = params["enc_embed"]["proj"]
        x = enc.astype(dt) @ p["kernel"].astype(dt) + p["bias"].astype(dt)
        T = enc.shape[1]
    else:
        emb = params["enc_embed"]["embed"]["embedding"].astype(dt)
        x = emb[enc]
        T = enc.shape[1]
    x = x * jnp.asarray(np.sqrt(d), dt)
    return x + table[:T]


def _mha_pool(params, cfg, q_in, kv_in, key_mask, dt):
    """Bottleneck pool_attn: flax MultiHeadAttention (xla path) as pure fn."""
    H = cfg.num_heads
    Dh = cfg.d_model // H

    def proj(name, x):
        p = params[name]
        out = jnp.einsum("...tm,mhd->...thd", x, p["kernel"].astype(dt))
        return out + p["bias"].astype(dt)

    q = proj("query", q_in)
    k = proj("key", kv_in)
    v = proj("value", kv_in)
    mask = None if key_mask is None else key_mask[:, None, None, :]
    out = dot_product_attention(q, k, v, mask=mask, impl="xla")
    po = params["out"]
    return (jnp.einsum("...thd,hdm->...tm", out, po["kernel"].astype(dt))
            + po["bias"].astype(dt))


def _bottleneck_z(params, cfg, enc_out, key_mask, dt):
    """Bottleneck.__call__ z-branch (models/bottleneck.py)."""
    bp = params["bottleneck"]
    B = enc_out.shape[0]
    if cfg.bottleneck_mode == "attn":
        q = jnp.broadcast_to(
            bp["queries"].astype(dt), (B, cfg.num_queries, cfg.d_model))
        pooled = _mha_pool(bp["pool_attn"], cfg, q, enc_out, key_mask, dt)
        flat = pooled.reshape(B, cfg.num_queries * cfg.d_model)
    else:  # mean | direct share the pooled-projection z
        if key_mask is not None:
            m = key_mask[:, :, None].astype(enc_out.dtype)
            denom = jnp.maximum(m.sum(axis=1), 1.0)
            flat = (enc_out * m).sum(axis=1) / denom
        else:
            flat = enc_out.mean(axis=1)
    tz = bp["to_z"]
    return flat @ tz["kernel"].astype(dt) + tz["bias"].astype(dt)


def fast_embed(model: Sketchformer, params, enc,
               enc_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Drop-in for ``model.apply(..., method=Sketchformer.embed)``."""
    from sketchformer_tpu.utils.engines import note_engine

    cfg = model.config
    ok, why = fast_path_support(model)
    if not ok:
        note_engine("embed", "composed", why)
        return model.apply({"params": params}, enc, enc_mask,
                           method=Sketchformer.embed)
    note_engine("embed", "fused-encoder-kernel")
    dt = cfg.compute_dtype
    if cfg.use_continuous:
        key_mask = None if enc_mask is None else enc_mask > 0.5
    else:
        key_mask = enc != 0
    x = _embed_input(params, cfg, enc, dt)
    w = stack_encoder_weights(
        params["encoder"], num_layers=cfg.num_layers, compute_dtype=dt)
    enc_out = fused_encoder_stack(
        x, key_mask, w, num_heads=cfg.num_heads, qk_norm=cfg.qk_norm)
    return _bottleneck_z(params, cfg, enc_out, key_mask, dt)


def make_fast_embed_fn(model: Sketchformer) -> Callable:
    """Jitted ``embed(params, enc, enc_mask=None) -> (B, lowerdim)``."""
    return jax.jit(partial(fast_embed, model))
