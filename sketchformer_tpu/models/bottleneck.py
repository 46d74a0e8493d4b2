"""Self-attention bottleneck: variable-length encoding -> fixed-length z.

The paper's novel element (arXiv:2002.10381): encoder outputs are pooled
into a fixed-length embedding that feeds both the classifier and the
decoder, which reconstructs the sketch conditioned ONLY on the bottleneck.
The paper compares bottleneck strategies; all three are implemented here
(reference: models/sketchformer.py bottleneck options / "lowerdim"):

- ``attn``   learned-query attention pooling (paper's best; default)
- ``mean``   masked mean pooling + projection
- ``direct`` no bottleneck — decoder cross-attends the full encoder memory
             (variable-length ablation); z for the classifier is still a
             pooled projection so the embedding API stays uniform

``__call__`` returns ``(z, memory, memory_mask)`` where ``memory`` is what
the decoder cross-attends and ``memory_mask`` is a 2-D (B, M) boolean key
mask (or None when every slot is valid). For attn/mean the memory is RE-EXPANDED from z
via ``expand_z`` (never built from the encoder sequence), enforcing the
information bottleneck — and making decode-from-a-stored-embedding (SBIR
gallery reconstruction, interpolation) a first-class path.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from sketchformer_tpu.models.attention import MultiHeadAttention


class Bottleneck(nn.Module):
    mode: str = "attn"
    lowerdim: int = 256
    num_queries: int = 4
    d_model: int = 256
    num_heads: int = 8
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    def setup(self) -> None:
        if self.mode == "attn":
            self.queries = self.param(
                "queries",
                nn.initializers.normal(stddev=0.02),
                (self.num_queries, self.d_model),
            )
            self.pool_attn = MultiHeadAttention(
                self.num_heads, self.d_model, self.dropout, self.dtype,
                name="pool_attn")
            self.to_z = nn.Dense(self.lowerdim, dtype=self.dtype, name="to_z")
        elif self.mode in ("mean", "direct"):
            self.to_z = nn.Dense(self.lowerdim, dtype=self.dtype, name="to_z")
        else:
            raise ValueError(f"unknown bottleneck mode {self.mode!r}")
        if self.mode != "direct":
            self.expand = nn.Dense(
                self.num_queries * self.d_model, dtype=self.dtype,
                name="expand")

    def expand_z(self, z: jnp.ndarray) -> jnp.ndarray:
        """Fixed-length embedding -> decoder memory (B, num_queries, D)."""
        if self.mode == "direct":
            raise ValueError("direct mode has no z->memory expansion")
        B = z.shape[0]
        return self.expand(z.astype(self.dtype)).reshape(
            B, self.num_queries, self.d_model)

    def __call__(
        self,
        enc_out: jnp.ndarray,                 # (B, T, D)
        enc_key_mask: Optional[jnp.ndarray],  # (B, T) bool or None
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]]:
        B = enc_out.shape[0]
        if self.mode == "attn":
            q = jnp.broadcast_to(
                self.queries.astype(self.dtype),
                (B, self.num_queries, self.d_model))
            pooled = self.pool_attn(
                q, enc_out, key_mask=enc_key_mask,
                deterministic=deterministic)
            z = self.to_z(pooled.reshape(B, self.num_queries * self.d_model))
        else:
            if enc_key_mask is not None:
                m = enc_key_mask[:, :, None].astype(enc_out.dtype)
                denom = jnp.maximum(m.sum(axis=1), 1.0)
                pooled = (enc_out * m).sum(axis=1) / denom
            else:
                pooled = enc_out.mean(axis=1)
            z = self.to_z(pooled)

        if self.mode == "direct":
            return z, enc_out, enc_key_mask
        return z, self.expand_z(z), None  # all memory slots valid
