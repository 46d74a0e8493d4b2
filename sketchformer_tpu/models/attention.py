"""Multi-head attention with a pluggable kernel backend and KV-cache decode.

Capability parity with the reference's attention stack (reference: models/
transformer layer module — scaled dot-product attention + MultiHeadAttention
with padding and look-ahead masks). Re-designed TPU-first:

- attention math dispatches through :func:`dot_product_attention` so the
  training path can switch between the XLA einsum formulation and the fused
  Pallas flash kernel (``impl='pallas'``) without touching model code;
- softmax always accumulates in f32 even when activations are bf16;
- decode mode keeps a static-shape KV cache (linen ``cache`` collection)
  written with ``lax.dynamic_update_slice`` — the reference re-runs the full
  decoder over the growing prefix each AR step (no cache), which is the main
  decode inefficiency the north star calls out.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from sketchformer_tpu.models.dropout import Dropout

NEG_INF = -1e9


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    impl: str = "xla",
) -> jnp.ndarray:
    """Attention over (B, T, H, Dh) tensors; mask is boolean, True=attend.

    ``mask`` broadcasts against (B, H, Tq, Tk).
    """
    if impl == "pallas":
        from sketchformer_tpu.ops.pallas_attention import flash_attention

        return flash_attention(q, k, v, mask=mask)
    if impl != "xla":
        raise ValueError(f"unknown attention impl {impl!r}")
    depth = q.shape[-1]
    scale = jnp.asarray(1.0 / jnp.sqrt(depth), q.dtype)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k)
    logits = logits.astype(jnp.float32)
    if mask is not None:
        logits = jnp.where(mask, logits, NEG_INF)
    weights = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", weights, v)


def cached_decode_attention(
    q: jnp.ndarray,          # (B*H, 1, D)
    k_cache: jnp.ndarray,    # (B*H, Tmax, D) head-folded
    v_cache: jnp.ndarray,
    cache_len: jnp.ndarray,  # scalar int32
    impl: str = "xla",
) -> jnp.ndarray:
    """Single-step attention against a head-folded KV cache."""
    if impl == "pallas":
        from sketchformer_tpu.ops.pallas_decode import decode_attention

        return decode_attention(q, k_cache, v_cache, cache_len)
    D = q.shape[-1]
    scale = jnp.asarray(1.0 / jnp.sqrt(D), q.dtype)
    logits = jnp.einsum("bqd,bkd->bqk", q * scale, k_cache)
    logits = logits.astype(jnp.float32)
    filled = jnp.arange(k_cache.shape[1]) < cache_len
    logits = jnp.where(filled[None, None, :], logits, NEG_INF)
    weights = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bqk,bkd->bqd", weights, v_cache)


def _full_mask(mask, structured, Tq):
    """Materialize the legacy 4-D mask from structured (key_mask, causal)
    for the XLA attention path."""
    if structured is None:
        return mask
    key_mask, causal = structured
    return combine_masks(
        mask,
        None if key_mask is None else key_mask[:, None, None, :],
        causal_mask(Tq) if causal else None,
    )


class HeadProjection(nn.Module):
    """x (..., T, d_model) -> per-head q/k/v with selectable output layout.

    Param-compatible with ``nn.DenseGeneral(features=(H, Dh))`` (kernel
    (d_model, H, Dh), bias (H, Dh)) but computed as an einsum so the Pallas
    path can get HEAD-MAJOR (..., H, T, Dh) output with the transpose fused
    into the matmul epilogue by XLA — an explicit transpose of (B,T,H,D)
    activations costs more HBM traffic than the fused kernel saves.
    """

    num_heads: int
    head_dim: int
    head_major: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d_in = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (d_in, self.num_heads, self.head_dim)).astype(self.dtype)
        bias = self.param(
            "bias", nn.initializers.zeros,
            (self.num_heads, self.head_dim)).astype(self.dtype)
        if self.head_major:
            out = jnp.einsum("...tm,mhd->...htd", x, kernel)
            return out + bias[:, None, :]
        out = jnp.einsum("...tm,mhd->...thd", x, kernel)
        return out + bias


class HeadOutProjection(nn.Module):
    """Per-head attention output -> d_model; accepts either layout.

    Param-compatible with ``nn.DenseGeneral(features=d_model, axis=(-2,-1))``
    (kernel (H, Dh, d_model), bias (d_model,)).
    """

    num_heads: int
    head_dim: int
    d_model: int
    head_major: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.num_heads, self.head_dim, self.d_model)).astype(self.dtype)
        bias = self.param(
            "bias", nn.initializers.zeros, (self.d_model,)).astype(self.dtype)
        eq = "...htd,hdm->...tm" if self.head_major else "...thd,hdm->...tm"
        return jnp.einsum(eq, x, kernel) + bias


class MultiHeadAttention(nn.Module):
    """MHA with separate q and kv inputs (self- or cross-attention).

    ``qk_norm`` applies per-head LayerNorm to q and k before the dot
    product (Gilmer et al. / ViT-22B recipe) — bounds attention logits and
    prevents the logit-growth divergence observed in bf16 pretraining at
    high Noam peak (grad norms crept 10->60->1e7 just past warmup).
    """

    num_heads: int
    d_model: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"
    qk_norm: bool = False

    @nn.compact
    def __call__(
        self,
        q_inp: jnp.ndarray,
        kv_inp: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        decode: bool = False,
        key_mask: Optional[jnp.ndarray] = None,
        causal: bool = False,
    ) -> jnp.ndarray:
        """``mask`` is the legacy 4-D boolean form. Prefer the STRUCTURED
        form — ``key_mask`` (B, Tk) + ``causal`` — which the Pallas kernel
        applies without materializing a quadratic mask tensor (the XLA path
        builds the equivalent 4-D mask internally)."""
        if self.d_model % self.num_heads:
            raise ValueError("num_heads must divide d_model")
        head_dim = self.d_model // self.num_heads
        if mask is None and (key_mask is not None or causal):
            structured = (key_mask, causal)
        else:
            if mask is not None and (key_mask is not None or causal):
                # legacy 4-D mask alongside structured args: fold the
                # structured terms in rather than silently dropping them
                mask = combine_masks(
                    mask,
                    None if key_mask is None
                    else key_mask[:, None, None, :],
                    causal_mask(q_inp.shape[1]) if causal else None)
            structured = None
        # head-major only pays on the fused-kernel training path
        head_major = self.attn_impl == "pallas" and not decode
        proj = lambda name: HeadProjection(
            self.num_heads, head_dim, head_major, self.dtype, name=name)
        q = proj("query")(q_inp)
        k = proj("key")(kv_inp)
        v = proj("value")(kv_inp)
        if self.qk_norm:
            # normalizes the head_dim axis; layout-agnostic (last axis in
            # both (B,T,H,D) and (B,H,T,D))
            q = nn.LayerNorm(dtype=self.dtype, name="q_norm")(q)
            k = nn.LayerNorm(dtype=self.dtype, name="k_norm")(k)

        if decode:
            # Static-shape KV cache, stored HEAD-FOLDED as (B*H, Tmax, Dh) so
            # the Pallas decode kernel consumes it with zero relayout (see
            # ops/pallas_decode.py). kv_inp carries ONE new position per call.
            B, Tmax = q_inp.shape[0], q_inp.shape[1]
            is_init = not self.has_variable("cache", "cached_key")
            cached_key = self.variable(
                "cache", "cached_key",
                lambda: jnp.zeros((B * self.num_heads, Tmax, head_dim),
                                  self.dtype))
            cached_value = self.variable(
                "cache", "cached_value",
                lambda: jnp.zeros_like(cached_key.value))
            cache_index = self.variable(
                "cache", "cache_index", lambda: jnp.zeros((), jnp.int32))
            if not is_init:
                idx = cache_index.value
                fold = lambda x: x.transpose(0, 2, 1, 3).reshape(
                    x.shape[0] * self.num_heads, x.shape[1], head_dim)
                cached_key.value = jax.lax.dynamic_update_slice(
                    cached_key.value, fold(k), (0, idx, 0))
                cached_value.value = jax.lax.dynamic_update_slice(
                    cached_value.value, fold(v), (0, idx, 0))
                new_len = idx + k.shape[1]
                cache_index.value = new_len
                folded = cached_decode_attention(
                    fold(q), cached_key.value, cached_value.value, new_len,
                    impl=self.attn_impl)
                out = folded.reshape(
                    q.shape[0], self.num_heads, q.shape[1], head_dim
                ).transpose(0, 2, 1, 3)
            else:
                out = dot_product_attention(
                    q, k, v, mask=_full_mask(mask, structured, q.shape[1]),
                    impl="xla")
        elif head_major:
            from sketchformer_tpu.ops.pallas_attention import flash_attention

            out = flash_attention(
                q, k, v, mask=mask, head_major=True,
                key_mask=structured[0] if structured else None,
                causal=structured[1] if structured else False)
        else:
            out = dot_product_attention(
                q, k, v, mask=_full_mask(mask, structured, q.shape[1]),
                impl=self.attn_impl)
        out = HeadOutProjection(
            self.num_heads, head_dim, self.d_model, head_major and not decode,
            self.dtype, name="out")(out)
        if self.dropout > 0.0:
            out = Dropout(self.dropout)(out, deterministic=deterministic)
        return out


# ---------------------------------------------------------------------------
# mask builders (reference: padding mask + look-ahead mask helpers)
# ---------------------------------------------------------------------------


def key_mask_from_ids(ids: jnp.ndarray, pad_id: int = 0) -> jnp.ndarray:
    """(B, T) int tokens -> (B, T) boolean key mask, True=attend.

    The 2-D form is what the model threads to attention (the Pallas kernel
    applies it without materializing a quadratic mask)."""
    return ids != pad_id


def key_mask_from_float(mask: jnp.ndarray) -> jnp.ndarray:
    """(B, T) float/bool validity -> (B, T) boolean key mask."""
    return mask > 0.5


def padding_mask_from_ids(ids: jnp.ndarray, pad_id: int = 0) -> jnp.ndarray:
    """(B, T) int tokens -> (B, 1, 1, T) boolean key mask, True=attend."""
    return (ids != pad_id)[:, None, None, :]


def padding_mask_from_float(mask: jnp.ndarray) -> jnp.ndarray:
    """(B, T) float/bool validity -> (B, 1, 1, T) boolean key mask."""
    return (mask > 0.5)[:, None, None, :]


def causal_mask(length: int) -> jnp.ndarray:
    """(1, 1, T, T) boolean look-ahead mask, True=attend."""
    return jnp.tril(jnp.ones((length, length), bool))[None, None]


def combine_masks(*masks: Optional[jnp.ndarray]) -> Optional[jnp.ndarray]:
    present = [m for m in masks if m is not None]
    if not present:
        return None
    out = present[0]
    for m in present[1:]:
        out = jnp.logical_and(out, m)
    return out
