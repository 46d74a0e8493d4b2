"""Fused decoder-stack kernels == composed flax path, values AND grads.

Interpret mode on CPU (f32). Pins ops/pallas_decoder_train.py: forward
values, input gradients (x AND memory), and every per-layer weight
gradient vs jax.grad of the composed Decoder.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sketchformer_tpu.models.transformer import Decoder
from sketchformer_tpu.ops.pallas_decoder_train import (
    fused_decoder_stack,
    fused_decoder_stack_train,
    stack_decoder_weights,
)
from sketchformer_tpu.ops.pallas_encoder_train import apply_final_ln

# full-tier only: heavy kernel/equivalence coverage (pyproject two-tier note)
pytestmark = pytest.mark.slow


def _setup(qk_norm=False, T=24, d=32, H=2, L=2, dff=64, B=4, Mq=4,
           masked=True, cross_masked=False):
    dec = Decoder(num_layers=L, num_heads=H, d_model=d, dff=dff,
                  dropout=0.0, dtype=jnp.float32, attn_impl="xla",
                  norm_first=True, qk_norm=qk_norm)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, d)).astype(np.float32))
    mem = jnp.asarray(rng.standard_normal((B, Mq, d)).astype(np.float32))
    km = None
    if masked:
        m = np.ones((B, T), bool)
        m[:, -5:] = False
        km = jnp.asarray(m)
    ckm = None
    if cross_masked:
        cm = np.ones((B, Mq), bool)
        cm[:, -1:] = False
        ckm = jnp.asarray(cm)
    params = dec.init(jax.random.PRNGKey(0), x, mem, causal=True,
                      self_key_mask=km, cross_key_mask=ckm)["params"]
    return dec, params, x, mem, km, ckm


def _loss_ref(dec, params, x, mem, km, ckm):
    y = dec.apply({"params": params}, x, mem, causal=True,
                  self_key_mask=km, cross_key_mask=ckm)
    return (y.astype(jnp.float32) ** 2).sum()


def _loss_fused(dec, params, x, mem, km, ckm):
    w = stack_decoder_weights(params, num_layers=dec.num_layers,
                              compute_dtype=jnp.float32)
    y = fused_decoder_stack_train(
        x, mem, km, ckm, w, num_heads=dec.num_heads, qk_norm=dec.qk_norm)
    y = apply_final_ln(y, w)
    return (y.astype(jnp.float32) ** 2).sum()


@pytest.mark.parametrize("qk_norm", [False, True])
@pytest.mark.parametrize("masked", [True, False])
def test_dec_train_stack_value_and_grads(qk_norm, masked):
    dec, params, x, mem, km, ckm = _setup(qk_norm=qk_norm, masked=masked)

    ref_v, ref_g = jax.value_and_grad(
        lambda p, xx, mm: _loss_ref(dec, p, xx, mm, km, ckm),
        argnums=(0, 1, 2))(params, x, mem)
    got_v, got_g = jax.value_and_grad(
        lambda p, xx, mm: _loss_fused(dec, p, xx, mm, km, ckm),
        argnums=(0, 1, 2))(params, x, mem)

    np.testing.assert_allclose(float(got_v), float(ref_v), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_g[1]), np.asarray(ref_g[1]),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_g[2]), np.asarray(ref_g[2]),
                               rtol=1e-3, atol=1e-4)
    got_map = {jax.tree_util.keystr(k): v for k, v in
               jax.tree_util.tree_leaves_with_path(got_g[0])}
    for path, leaf in jax.tree_util.tree_leaves_with_path(ref_g[0]):
        key = jax.tree_util.keystr(path)
        np.testing.assert_allclose(
            np.asarray(got_map[key]), np.asarray(leaf),
            rtol=1e-3, atol=1e-4, err_msg=key)


def test_dec_train_stack_cross_mask():
    dec, params, x, mem, km, ckm = _setup(cross_masked=True, Mq=8)
    ref = _loss_ref(dec, params, x, mem, km, ckm)
    got = _loss_fused(dec, params, x, mem, km, ckm)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-4)


def test_dec_inference_stack_matches_composed():
    dec, params, x, mem, km, ckm = _setup()
    ref = dec.apply({"params": params}, x, mem, causal=True,
                    self_key_mask=km)
    w = stack_decoder_weights(params, num_layers=dec.num_layers,
                              compute_dtype=jnp.float32)
    got = fused_decoder_stack(x, mem, km, None, w,
                              num_heads=dec.num_heads, qk_norm=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_dec_fused_via_module():
    """Decoder with attn_impl='pallas' routes to the fused kernels and
    matches the composed xla module."""
    dec, params, x, mem, km, ckm = _setup()
    dec_p = Decoder(num_layers=dec.num_layers, num_heads=dec.num_heads,
                    d_model=dec.d_model, dff=dec.dff, dropout=0.0,
                    dtype=jnp.float32, attn_impl="pallas",
                    norm_first=True, qk_norm=False)
    ref = dec.apply({"params": params}, x, mem, causal=True,
                    self_key_mask=km)
    got = dec_p.apply({"params": params}, x, mem, causal=True,
                      self_key_mask=km)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("qk_norm", [False, True])
def test_dec_train_stack_packed_small_heads(qk_norm):
    """PACKED small-head decoder train path (d=128, H=8 -> Dh=16): values,
    x/memory grads, and every weight grad — incl. tiled qk-norm params
    and cross-memory pad-row handling (Mq=4, padded to 8 in-kernel)."""
    from sketchformer_tpu.ops import pallas_packed as pk

    dec, params, x, mem, km, ckm = _setup(
        qk_norm=qk_norm, T=16, d=128, H=8, dff=64, Mq=4,
        cross_masked=True)
    assert pk.packed_supported(128, 8)

    ref_v, ref_g = jax.value_and_grad(
        lambda p, xx, mm: _loss_ref(dec, p, xx, mm, km, ckm),
        argnums=(0, 1, 2))(params, x, mem)
    got_v, got_g = jax.value_and_grad(
        lambda p, xx, mm: _loss_fused(dec, p, xx, mm, km, ckm),
        argnums=(0, 1, 2))(params, x, mem)

    np.testing.assert_allclose(float(got_v), float(ref_v), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_g[1]), np.asarray(ref_g[1]),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_g[2]), np.asarray(ref_g[2]),
                               rtol=1e-3, atol=1e-4)
    got_map = {jax.tree_util.keystr(k): v for k, v in
               jax.tree_util.tree_leaves_with_path(got_g[0])}
    for path, leaf in jax.tree_util.tree_leaves_with_path(ref_g[0]):
        key = jax.tree_util.keystr(path)
        np.testing.assert_allclose(
            np.asarray(got_map[key]), np.asarray(leaf),
            rtol=1e-3, atol=1e-4, err_msg=key)
