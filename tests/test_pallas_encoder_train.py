"""Fused encoder-stack TRAIN path == composed flax path, values AND grads.

Runs in interpret mode on CPU (f32) so equality is tight. Pins the custom
VJP (ops/pallas_encoder_train.py): forward values, input gradients, and
every per-layer weight gradient must match jax.grad of the composed
Encoder.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sketchformer_tpu.models.transformer import Encoder
from sketchformer_tpu.ops.pallas_encoder import stack_encoder_weights
from sketchformer_tpu.ops.pallas_encoder_train import (
    apply_final_ln,
    fused_encoder_stack_train,
)

# full-tier only: heavy kernel/equivalence coverage (pyproject two-tier note)
pytestmark = pytest.mark.slow


def _setup(qk_norm=False, T=24, d=32, H=2, L=2, dff=64, B=4, masked=True):
    enc = Encoder(num_layers=L, num_heads=H, d_model=d, dff=dff,
                  dropout=0.0, dtype=jnp.float32, attn_impl="xla",
                  norm_first=True, qk_norm=qk_norm)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, d)).astype(np.float32))
    km = None
    if masked:
        m = np.ones((B, T), bool)
        m[:, -5:] = False
        km = jnp.asarray(m)
    params = enc.init(jax.random.PRNGKey(0), x, key_mask=km)["params"]
    return enc, params, x, km


def _loss_ref(enc, params, x, km):
    y = enc.apply({"params": params}, x, key_mask=km)
    return (y.astype(jnp.float32) ** 2).sum()


def _loss_fused(enc, params, x, km):
    w = stack_encoder_weights(params, num_layers=enc.num_layers,
                              compute_dtype=jnp.float32)
    y = fused_encoder_stack_train(x, km, w, num_heads=enc.num_heads,
                                  qk_norm=enc.qk_norm)
    y = apply_final_ln(y, w)
    return (y.astype(jnp.float32) ** 2).sum()


@pytest.mark.parametrize("qk_norm", [False, True])
@pytest.mark.parametrize("masked", [True, False])
def test_train_stack_value_and_grads(qk_norm, masked):
    enc, params, x, km = _setup(qk_norm=qk_norm, masked=masked)

    ref_v, ref_g = jax.value_and_grad(
        lambda p, xx: _loss_ref(enc, p, xx, km), argnums=(0, 1))(params, x)
    got_v, got_g = jax.value_and_grad(
        lambda p, xx: _loss_fused(enc, p, xx, km), argnums=(0, 1))(params, x)

    np.testing.assert_allclose(float(got_v), float(ref_v),
                               rtol=1e-4)
    # input gradient
    np.testing.assert_allclose(np.asarray(got_g[1]), np.asarray(ref_g[1]),
                               rtol=1e-3, atol=1e-4)
    # every weight gradient
    flat_ref = jax.tree_util.tree_leaves_with_path(ref_g[0])
    flat_got = jax.tree_util.tree_flatten(got_g[0])[0]
    got_map = dict(zip([jax.tree_util.keystr(k)
                        for k, _ in jax.tree_util.tree_leaves_with_path(
                            got_g[0])],
                       flat_got))
    for path, leaf in flat_ref:
        key = jax.tree_util.keystr(path)
        np.testing.assert_allclose(
            np.asarray(got_map[key]), np.asarray(leaf),
            rtol=1e-3, atol=1e-4, err_msg=key)


def _jnp_stack_ref(x, km, w, H, drop_bits, thresh):
    """Pure-jnp pre-LN stack with u8-threshold dropout from given bits —
    the oracle for the fused train path's dropout semantics."""
    eps = 1e-6
    f32 = jnp.float32

    def ln(v, s, b):
        v32 = v.astype(f32)
        mu = v32.mean(-1, keepdims=True)
        var = jnp.maximum((v32 * v32).mean(-1, keepdims=True) - mu * mu, 0)
        return ((v32 - mu) * jax.lax.rsqrt(var + eps)) * s + b

    def drop(v, bits):
        ks = 1.0 / (1.0 - thresh / 256.0)
        return jnp.where(bits >= thresh, v * ks, 0.0)

    B, T, d = x.shape
    L = w["wqkv"].shape[0]
    Dh = d // H
    scale = 1.0 / (Dh ** 0.5)
    bias = jnp.where(km, 0.0, -1e9)[:, None, None, :] if km is not None \
        else 0.0
    h = x.astype(f32)
    for i in range(L):
        hn = ln(h, w["ln1s"][i], w["ln1b"][i])
        qkv = hn @ w["wqkv"][i].astype(f32) + w["bqkv"][i]
        qkv = qkv.reshape(B, T, 3, H, Dh)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B,T,H,Dh)
        s = jnp.einsum("bthd,bshd->bhts", q, k) * scale + bias
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhts,bshd->bthd", p, v).reshape(B, T, H * Dh)
        attn = o @ w["wo"][i].astype(f32) + w["bo"][i]
        h = h + drop(attn, drop_bits[2 * i])
        hn = ln(h, w["ln2s"][i], w["ln2b"][i])
        f1 = jnp.maximum(hn @ w["w1"][i].astype(f32) + w["b1"][i], 0)
        f = f1 @ w["w2"][i].astype(f32) + w["b2"][i]
        h = h + drop(f, drop_bits[2 * i + 1])
    return h


def test_train_stack_dropout_matches_jnp_oracle():
    """Dropout on: fused value+grads == pure-jnp stack with the SAME bits."""
    enc, params, x, km = _setup(masked=True)
    L, H = enc.num_layers, enc.num_heads
    rate = 0.25
    thresh = round(rate * 256)
    key = jax.random.PRNGKey(7)
    B, T, d = x.shape
    bits = jax.random.bits(key, (2 * L, B, T, d), dtype=jnp.uint8)

    def loss_fused(p, xx):
        w = stack_encoder_weights(p, num_layers=L,
                                  compute_dtype=jnp.float32)
        y = fused_encoder_stack_train(
            xx, km, w, num_heads=H, qk_norm=False,
            dropout_rate=rate, dropout_rng=key)
        return (y.astype(jnp.float32) ** 2).sum()

    def loss_ref(p, xx):
        w = stack_encoder_weights(p, num_layers=L,
                                  compute_dtype=jnp.float32)
        y = _jnp_stack_ref(xx, km, w, H, bits, thresh)
        return (y ** 2).sum()

    rv, rg = jax.value_and_grad(loss_ref, argnums=(0, 1))(params, x)
    gv, gg = jax.value_and_grad(loss_fused, argnums=(0, 1))(params, x)
    np.testing.assert_allclose(float(gv), float(rv), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gg[1]), np.asarray(rg[1]),
                               rtol=1e-3, atol=1e-4)
    for (pa, la), (pb, lb) in zip(
            jax.tree_util.tree_leaves_with_path(rg[0]),
            jax.tree_util.tree_leaves_with_path(gg[0])):
        np.testing.assert_allclose(
            np.asarray(lb), np.asarray(la), rtol=1e-3, atol=1e-4,
            err_msg=jax.tree_util.keystr(pa))


def test_train_stack_matches_inference_kernel():
    """train fwd (no final LN) + apply_final_ln == inference stack fwd."""
    from sketchformer_tpu.ops.pallas_encoder import fused_encoder_stack

    enc, params, x, km = _setup()
    w = stack_encoder_weights(params, num_layers=enc.num_layers,
                              compute_dtype=jnp.float32)
    ref = fused_encoder_stack(x, km, w, num_heads=enc.num_heads,
                              qk_norm=False)
    got = apply_final_ln(
        fused_encoder_stack_train(x, km, w, num_heads=enc.num_heads,
                                  qk_norm=False), w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("qk_norm", [False, True])
def test_train_stack_packed_small_heads(qk_norm):
    """PACKED small-head train path (d=128, H=8 -> Dh=16): values, input
    grads, and every weight grad — including the qk-norm params whose
    tiled-lane grads must reduce back to (Dh,) (round-3 packed train)."""
    from sketchformer_tpu.ops import pallas_packed as pk

    enc, params, x, km = _setup(T=16, d=128, H=8, dff=64, qk_norm=qk_norm)
    assert pk.packed_supported(128, 8)

    ref_v, ref_g = jax.value_and_grad(
        lambda p, xx: _loss_ref(enc, p, xx, km), argnums=(0, 1))(params, x)
    got_v, got_g = jax.value_and_grad(
        lambda p, xx: _loss_fused(enc, p, xx, km), argnums=(0, 1))(params, x)

    np.testing.assert_allclose(float(got_v), float(ref_v), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_g[1]), np.asarray(ref_g[1]),
                               rtol=1e-3, atol=1e-4)
    got_map = dict(zip([jax.tree_util.keystr(k)
                        for k, _ in jax.tree_util.tree_leaves_with_path(
                            got_g[0])],
                       jax.tree_util.tree_flatten(got_g[0])[0]))
    for path, leaf in jax.tree_util.tree_leaves_with_path(ref_g[0]):
        key = jax.tree_util.keystr(path)
        np.testing.assert_allclose(
            np.asarray(got_map[key]), np.asarray(leaf),
            rtol=1e-3, atol=1e-4, err_msg=key)


def test_packed_softmax_variants_agree(monkeypatch):
    """The SK_PACKED_SOFTMAX strategies (chunk / seg4d / mxu / fused / fused2) are
    pure scheduling choices — fwd values, input grads, and weight grads
    must agree to f32 rounding (round-4 packed-bwd VPU work; round-5
    fused e/r residual path)."""
    from sketchformer_tpu.ops import pallas_packed as pk

    enc, params, x, km = _setup(T=16, d=128, H=8, dff=64, qk_norm=True)

    def run(variant):
        monkeypatch.setattr(pk, "_TRAIN_SOFTMAX", variant)
        return jax.value_and_grad(
            lambda p, xx: _loss_fused(enc, p, xx, km),
            argnums=(0, 1))(params, x)

    base_v, base_g = run("chunk")
    for variant in ("seg4d", "mxu", "fused", "fused2"):
        v, g = run(variant)
        np.testing.assert_allclose(float(v), float(base_v), rtol=1e-6)
        for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(base_g)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
