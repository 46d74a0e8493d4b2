"""Pallas kernels vs XLA reference in interpret mode on CPU (SURVEY §4.5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sketchformer_tpu.models.attention import (
    cached_decode_attention,
    causal_mask,
    combine_masks,
    dot_product_attention,
    padding_mask_from_ids,
)
from sketchformer_tpu.ops.pallas_attention import flash_attention
from sketchformer_tpu.ops.pallas_decode import decode_attention


def _qkv(rng, B=2, T=64, H=4, D=32, dtype=np.float32):
    return tuple(
        jnp.asarray(rng.standard_normal((B, T, H, D)).astype(dtype))
        for _ in range(3)
    )


def _mask(rng, B=2, T=64):
    ids = jnp.asarray(rng.integers(1, 9, (B, T)).astype(np.int32))
    ids = ids.at[:, -10:].set(0)
    return combine_masks(causal_mask(T), padding_mask_from_ids(ids))


def test_flash_fwd_matches_xla():
    rng = np.random.default_rng(0)
    q, k, v = _qkv(rng)
    mask = _mask(rng)
    ref = dot_product_attention(q, k, v, mask=mask)
    got = flash_attention(q, k, v, mask=mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)


def test_flash_fwd_no_mask():
    rng = np.random.default_rng(1)
    q, k, v = _qkv(rng)
    ref = dot_product_attention(q, k, v)
    got = flash_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)


def test_flash_grads_match_xla():
    rng = np.random.default_rng(2)
    q, k, v = _qkv(rng)
    mask = _mask(rng)

    def loss(attn):
        return lambda q, k, v: (attn(q, k, v, mask=mask) ** 2).sum()

    gr = jax.grad(loss(dot_product_attention), argnums=(0, 1, 2))(q, k, v)
    gp = jax.grad(loss(flash_attention), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gr, gp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-5)


def test_flash_batch_grouping_consistency():
    """Grouped-grid path must not mix rows across batch elements."""
    rng = np.random.default_rng(3)
    q, k, v = _qkv(rng, B=4)
    mask = _mask(rng, B=4)
    full = flash_attention(q, k, v, mask=mask)
    # batch element 0 computed alone must equal its slice of the full batch
    solo = flash_attention(q[:1], k[:1], v[:1], mask=mask[:1])
    np.testing.assert_allclose(
        np.asarray(solo), np.asarray(full[:1]), atol=2e-6)


def test_flash_long_seq_falls_back():
    rng = np.random.default_rng(4)
    q, k, v = _qkv(rng, T=2048, B=1, H=1)
    out = flash_attention(q, k, v)  # > MAX_FUSED_LEN -> xla path
    ref = dot_product_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


@pytest.mark.parametrize("L", [1, 37, 256])
def test_decode_matches_xla(L):
    rng = np.random.default_rng(5)
    BH, Tmax, D = 16, 256, 32
    kc = jnp.asarray(rng.standard_normal((BH, Tmax, D)).astype(np.float32))
    vc = jnp.asarray(rng.standard_normal((BH, Tmax, D)).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((BH, 1, D)).astype(np.float32))
    ref = cached_decode_attention(q, kc, vc, jnp.int32(L), impl="xla")
    got = decode_attention(q, kc, vc, jnp.int32(L))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)


def test_decode_ignores_stale_cache_tail():
    """Entries beyond cache_len must not affect the result."""
    rng = np.random.default_rng(6)
    BH, Tmax, D = 8, 64, 32
    kc = jnp.asarray(rng.standard_normal((BH, Tmax, D)).astype(np.float32))
    vc = jnp.asarray(rng.standard_normal((BH, Tmax, D)).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((BH, 1, D)).astype(np.float32))
    a = decode_attention(q, kc, vc, jnp.int32(20))
    kc2 = kc.at[:, 20:].set(999.0)
    vc2 = vc.at[:, 20:].set(-999.0)
    b = decode_attention(q, kc2, vc2, jnp.int32(20))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_flash_flagship_shapes():
    """Flagship geometry: 2 heads x 128 head_dim (lane-filling config)."""
    rng = np.random.default_rng(7)
    q, k, v = _qkv(rng, B=2, T=96, H=2, D=128)
    mask = _mask(rng, B=2, T=96)
    ref = dot_product_attention(q, k, v, mask=mask)
    got = flash_attention(q, k, v, mask=mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-6)
    gr = jax.grad(lambda q, k, v: (
        dot_product_attention(q, k, v, mask=mask) ** 2).sum(),
        argnums=(0, 1, 2))(q, k, v)
    gp = jax.grad(lambda q, k, v: (
        flash_attention(q, k, v, mask=mask) ** 2).sum(),
        argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gr, gp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-5)


def test_decode_flagship_shapes():
    rng = np.random.default_rng(8)
    BH, Tmax, D = 4, 200, 128  # max_len+8 padded cache, head_dim 128
    kc = jnp.asarray(rng.standard_normal((BH, Tmax, D)).astype(np.float32))
    vc = jnp.asarray(rng.standard_normal((BH, Tmax, D)).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((BH, 1, D)).astype(np.float32))
    for L in (1, 77, 200):
        ref = cached_decode_attention(q, kc, vc, jnp.int32(L), impl="xla")
        got = decode_attention(q, kc, vc, jnp.int32(L))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-6)


def test_flash_structured_mask_matches_legacy():
    """key_mask+causal (no quadratic mask tensor) == legacy 4-D mask."""
    rng = np.random.default_rng(9)
    q, k, v = _qkv(rng, B=2, T=64)
    ids = jnp.asarray(rng.integers(1, 9, (2, 64)).astype(np.int32))
    ids = ids.at[:, -10:].set(0)
    km = ids != 0
    legacy = combine_masks(causal_mask(64), padding_mask_from_ids(ids))
    ref = flash_attention(q, k, v, mask=legacy)
    got = flash_attention(q, k, v, key_mask=km, causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)
    # key-only (encoder pattern)
    ref2 = flash_attention(q, k, v, mask=padding_mask_from_ids(ids))
    got2 = flash_attention(q, k, v, key_mask=km)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2), atol=2e-6)


def test_flash_structured_grads_match_xla():
    rng = np.random.default_rng(10)
    q, k, v = _qkv(rng, B=2, T=48, H=2, D=128)
    ids = jnp.asarray(rng.integers(1, 9, (2, 48)).astype(np.int32))
    ids = ids.at[:, -7:].set(0)
    km = ids != 0
    full = combine_masks(causal_mask(48), padding_mask_from_ids(ids))

    gr = jax.grad(lambda q, k, v: (
        dot_product_attention(q, k, v, mask=full) ** 2).sum(),
        argnums=(0, 1, 2))(q, k, v)
    gp = jax.grad(lambda q, k, v: (
        flash_attention(q, k, v, key_mask=km, causal=True) ** 2).sum(),
        argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gr, gp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-5)


def test_flash_head_major_structured():
    """Production layout (B, H, T, D) + structured masks, fwd and bwd."""
    rng = np.random.default_rng(11)
    B, H, T, D = 2, 2, 96, 128
    qh, kh, vh = (
        jnp.asarray(rng.standard_normal((B, H, T, D)).astype(np.float32))
        for _ in range(3))
    ids = jnp.asarray(rng.integers(1, 9, (B, T)).astype(np.int32))
    ids = ids.at[:, -10:].set(0)
    km = ids != 0
    to_bthd = lambda x: x.transpose(0, 2, 1, 3)
    full = combine_masks(causal_mask(T), padding_mask_from_ids(ids))
    ref = dot_product_attention(
        to_bthd(qh), to_bthd(kh), to_bthd(vh), mask=full)
    got = flash_attention(qh, kh, vh, key_mask=km, causal=True,
                          head_major=True)
    np.testing.assert_allclose(
        np.asarray(to_bthd(got)), np.asarray(ref), atol=3e-6)


def test_flash_rejects_mask_and_key_mask():
    rng = np.random.default_rng(12)
    q, k, v = _qkv(rng, B=1, T=8, H=1, D=8)
    with pytest.raises(ValueError):
        flash_attention(q, k, v, mask=_mask(rng, B=1, T=8),
                        key_mask=jnp.ones((1, 8), bool))
