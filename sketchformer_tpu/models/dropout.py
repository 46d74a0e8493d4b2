"""TPU-fast dropout: uint8-threshold masks.

The train-step profile (tools/bench_dropout.py, v5e) showed flax
``nn.Dropout`` costing ~0.15 ms per (512, 96, 256) activation site — and
the flagship model has 43 sites, ~16 ms of an 86 ms step. The cost is
dominated by hardware RNG bit generation (rbg), not the mask multiply, so
generating 8 random bits per element instead of 32 is ~5x faster
(measured: 0.029 vs 0.148 ms/site).

Semantics: an element drops when its random byte < round(rate * 256), so
the keep probability is quantized to 1/256 steps; the rescale uses the
REALIZED keep rate, keeping E[dropout(x)] == x exactly. For sketch-scale
dropout rates (0.1) the realized rate is 0.8984 vs 0.9 — well inside the
hyperparameter noise floor. ``impl='exact'`` restores bernoulli semantics
for strict ablation parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class Dropout(nn.Module):
    """Drop-in replacement for ``nn.Dropout`` (same rng collection)."""

    rate: float
    impl: str = "u8"  # u8 | exact

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        if deterministic or self.rate == 0.0:
            return x
        rng = self.make_rng("dropout")
        if self.impl == "exact":
            keep = jax.random.bernoulli(rng, 1.0 - self.rate, x.shape)
            return jnp.where(keep, x / (1.0 - self.rate), 0).astype(x.dtype)
        if self.impl != "u8":
            raise ValueError(f"unknown dropout impl {self.impl!r}")
        thresh = int(round(self.rate * 256))
        if thresh <= 0:
            return x
        bits = jax.random.bits(rng, x.shape, dtype=jnp.uint8)
        keep_rate = 1.0 - thresh / 256.0
        return jnp.where(bits >= thresh, x / keep_rate, 0).astype(x.dtype)
