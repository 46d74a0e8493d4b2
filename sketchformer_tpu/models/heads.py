"""Output heads: token softmax, MDN/GMM, classifier.

Capability parity with the reference's heads (reference:
models/sketchformer.py — (i) Dense->softmax over the dictionary in tok mode,
(ii) Dense->MDN params (pi, mu, sigma, rho, pen logits) in cont mode,
(iii) classifier MLP on the bottleneck -> 345 class logits).

All heads emit float32 logits/params regardless of trunk dtype — losses and
softmaxes stay in f32 while the MXU-heavy trunk runs bf16.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from sketchformer_tpu.models.dropout import Dropout


class TokenHead(nn.Module):
    vocab_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        logits = nn.Dense(self.vocab_size, dtype=self.dtype, name="proj")(x)
        return logits.astype(jnp.float32)


class MDNHead(nn.Module):
    num_mixtures: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        raw = nn.Dense(
            6 * self.num_mixtures + 3, dtype=self.dtype, name="proj"
        )(x)
        return raw.astype(jnp.float32)


class ClassifierHead(nn.Module):
    num_classes: int
    hidden: int = 256
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        h = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(z)
        h = nn.relu(h)
        if self.dropout > 0.0:
            h = Dropout(self.dropout)(h, deterministic=deterministic)
        logits = nn.Dense(self.num_classes, dtype=self.dtype, name="fc2")(h)
        return logits.astype(jnp.float32)
