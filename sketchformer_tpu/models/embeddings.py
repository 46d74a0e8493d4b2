"""Input embeddings and sinusoidal positional encoding.

Capability parity with the reference's embedding path (reference: models/
transformer layer module — token embedding scaled by sqrt(d_model) plus
sinusoidal positional encoding; continuous mode uses a dense projection of
raw stroke rows instead of a lookup).

TPU notes: the posenc table is a static (max_len, d_model) constant folded
into the compiled program; embeddings run in the compute dtype (bf16 on TPU)
while the table is built in f32 and cast once.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn


def sinusoidal_position_encoding(max_len: int, d_model: int) -> np.ndarray:
    """Classic transformer posenc table, shape (max_len, d_model), f32."""
    pos = np.arange(max_len, dtype=np.float32)[:, None]
    i = np.arange(d_model, dtype=np.float32)[None, :]
    angle_rates = 1.0 / np.power(10000.0, (2 * (i // 2)) / d_model)
    angles = pos * angle_rates
    table = np.zeros((max_len, d_model), dtype=np.float32)
    table[:, 0::2] = np.sin(angles[:, 0::2])
    table[:, 1::2] = np.cos(angles[:, 1::2])
    return table


class TokenEmbed(nn.Module):
    """Token lookup * sqrt(d_model) + posenc."""

    vocab_size: int
    d_model: int
    max_len: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, ids: jnp.ndarray, pos=None) -> jnp.ndarray:
        emb = nn.Embed(
            self.vocab_size,
            self.d_model,
            dtype=self.dtype,
            embedding_init=nn.initializers.normal(stddev=1.0 / np.sqrt(self.d_model)),
            name="embed",
        )(ids)
        emb = emb * jnp.asarray(np.sqrt(self.d_model), self.dtype)
        table = jnp.asarray(
            sinusoidal_position_encoding(self.max_len, self.d_model), self.dtype
        )
        if pos is None:
            pe = table[: ids.shape[-1]]
        else:  # dynamic scalar position (cached AR decode step)
            pe = jax.lax.dynamic_slice_in_dim(table, pos, ids.shape[-1], axis=0)
        return emb + pe


class ContinuousEmbed(nn.Module):
    """Dense projection of stroke rows (3 or 5 features) + posenc."""

    d_model: int
    max_len: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, rows: jnp.ndarray, pos=None) -> jnp.ndarray:
        emb = nn.Dense(self.d_model, dtype=self.dtype, name="proj")(rows)
        emb = emb * jnp.asarray(np.sqrt(self.d_model), self.dtype)
        table = jnp.asarray(
            sinusoidal_position_encoding(self.max_len, self.d_model), self.dtype
        )
        if pos is None:
            pe = table[: rows.shape[-2]]
        else:
            pe = jax.lax.dynamic_slice_in_dim(table, pos, rows.shape[-2], axis=0)
        return emb + pe
