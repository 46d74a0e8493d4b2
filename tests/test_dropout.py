"""Unit tests for the uint8-threshold Dropout (models/dropout.py).

The u8 impl trades exact Bernoulli(rate) for 8-bit RNG (5x faster on TPU,
tools/bench_dropout.py); these tests pin the semantics that replacement
relies on: identity when deterministic/rate=0, unbiased expectation under
the REALIZED keep rate, correct drop fraction, and flax rng-collection
compatibility (drop-in for nn.Dropout).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sketchformer_tpu.models.dropout import Dropout


def _apply(rate, x, key, impl="u8", deterministic=False):
    mod = Dropout(rate, impl=impl)
    return mod.apply({}, x, deterministic=deterministic,
                     rngs={"dropout": key})


def test_deterministic_identity():
    x = jnp.arange(24, dtype=jnp.float32).reshape(4, 6)
    out = Dropout(0.5).apply({}, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_rate_zero_identity():
    x = jnp.ones((8, 8))
    out = _apply(0.0, x, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_u8_unbiased_expectation():
    """E[dropout(x)] == x under the realized keep rate (exact rescale)."""
    rate = 0.1
    x = jnp.ones((2048, 256), jnp.float32)
    out = np.asarray(_apply(rate, x, jax.random.PRNGKey(1)))
    # realized keep rate = 1 - round(rate*256)/256
    thresh = round(rate * 256)
    keep_rate = 1.0 - thresh / 256.0
    # kept elements are exactly 1/keep_rate, dropped exactly 0
    vals = np.unique(out)
    assert len(vals) == 2
    np.testing.assert_allclose(
        vals, [0.0, 1.0 / keep_rate], atol=1e-6)
    # drop fraction matches thresh/256 within sampling noise
    frac_dropped = (out == 0).mean()
    assert abs(frac_dropped - thresh / 256.0) < 0.01
    # expectation unbiased
    assert abs(out.mean() - 1.0) < 0.01


def test_u8_tiny_rate_noop():
    """Rates that quantize to 0/256 pass through unchanged."""
    x = jnp.ones((16, 16))
    out = _apply(1e-4, x, jax.random.PRNGKey(2))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_exact_impl_bernoulli_semantics():
    """exact impl: values in {0, 1/(1-rate)}, drop fraction ~= rate.

    (Bit-exact comparison against jax.random.bernoulli with the raw key is
    impossible: make_rng folds the key — statistical pinning suffices.)
    """
    rate = 0.25
    x = jnp.ones((512, 128), jnp.float32)
    out = np.asarray(_apply(rate, x, jax.random.PRNGKey(3), impl="exact"))
    vals = np.unique(out)
    assert len(vals) == 2
    np.testing.assert_allclose(vals, [0.0, 1.0 / (1.0 - rate)], atol=1e-6)
    assert abs((out == 0).mean() - rate) < 0.02
    assert abs(out.mean() - 1.0) < 0.02


def test_unknown_impl_raises():
    with pytest.raises(ValueError):
        _apply(0.1, jnp.ones((4, 4)), jax.random.PRNGKey(0), impl="nope")


def test_dtype_preserved():
    x = jnp.ones((32, 32), jnp.bfloat16)
    out = _apply(0.1, x, jax.random.PRNGKey(4))
    assert out.dtype == jnp.bfloat16
