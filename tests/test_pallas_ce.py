"""Fused CE head kernel (ops/pallas_ce.py) equivalence pins.

CPU interpret-mode parity of the VMEM-resident CE kernel against the
plain XLA softmax-CE: per-row values, argmax-correct indicators, and all
three input gradients, including the padded-row / padded-vocab paths and
the end-to-end forward_tok_loss routing (attn_impl='pallas' selects the
kernel; 'xla' keeps the chunked rematerialized path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sketchformer_tpu.ops import pallas_ce


def _plain(x, w, b, tgt):
    l = (x @ w + b).astype(jnp.float32)
    lse = jax.nn.logsumexp(l, axis=-1)
    ll = jnp.take_along_axis(l, tgt[:, None], axis=-1)[:, 0] - lse
    corr = (jnp.argmax(l, axis=-1) == tgt).astype(jnp.float32)
    return ll, corr


@pytest.mark.parametrize("M,d,V", [(48, 32, 50), (37, 64, 131), (8, 16, 7)])
def test_ce_rows_values_and_grads(M, d, V):
    rng = np.random.default_rng(M + V)
    x = jnp.asarray(rng.standard_normal((M, d)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((d, V)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(V) * 0.1, jnp.float32)
    tgt = jnp.asarray(rng.integers(0, V, M).astype(np.int32))
    mask = jnp.asarray((rng.random(M) > 0.25).astype(np.float32))

    ll0, c0 = _plain(x, w, b, tgt)
    ll1, c1 = pallas_ce.token_ce_rows(x, w, b, tgt)
    np.testing.assert_allclose(np.asarray(ll1), np.asarray(ll0),
                               rtol=2e-6, atol=2e-6)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c0))

    def loss(fn):
        def f(x, w, b):
            ll, _ = fn(x, w, b, tgt)
            return -(ll * mask).sum() / jnp.maximum(mask.sum(), 1.0)
        return jax.grad(f, argnums=(0, 1, 2))(x, w, b)

    g0 = loss(_plain)
    g1 = loss(pallas_ce.token_ce_rows)
    for a, b_ in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=2e-5, atol=2e-5)


def test_ce_rows_bf16_semantics():
    """bf16 trunk: the kernel keeps the logits f32 end-to-end (bf16 MXU
    dot, f32 accumulation, f32 bias). It therefore matches the pure-f32
    logits reference tightly, and sits within ~1 bf16 ulp of the
    composed flax path (which rounds dot output + bias add to bf16)."""
    rng = np.random.default_rng(7)
    M, d, V = 24, 32, 77
    x = jnp.asarray(rng.standard_normal((M, d)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((d, V)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(V) * 0.1, jnp.float32)
    tgt = jnp.asarray(rng.integers(0, V, M).astype(np.int32))

    # what the kernel computes: f32 logits from the bf16 operands
    l32 = jax.lax.dot_general(
        x, w.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b
    lse32 = jax.nn.logsumexp(l32, axis=-1)
    ll32 = jnp.take_along_axis(l32, tgt[:, None], axis=-1)[:, 0] - lse32
    c32 = (jnp.argmax(l32, axis=-1) == tgt).astype(jnp.float32)

    ll1, c1 = pallas_ce.token_ce_rows(x, w, b, tgt)
    np.testing.assert_allclose(np.asarray(ll1), np.asarray(ll32),
                               rtol=2e-6, atol=2e-6)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c32))

    # composed flax path (extra bf16 rounds): within ~1 bf16 ulp
    lbf = (jnp.dot(x, w.astype(jnp.bfloat16))
           + b.astype(jnp.bfloat16)).astype(jnp.float32)
    lsebf = jax.nn.logsumexp(lbf, axis=-1)
    llbf = jnp.take_along_axis(lbf, tgt[:, None], axis=-1)[:, 0] - lsebf
    np.testing.assert_allclose(np.asarray(ll1), np.asarray(llbf),
                               atol=0.02)


def test_forward_tok_loss_pallas_matches_xla_impl():
    """forward_tok_loss under attn_impl='pallas' (kernel CE) == the same
    model under the chunked XLA CE: loss, acc, and every param grad."""
    from sketchformer_tpu.models import Sketchformer, SketchformerConfig
    import dataclasses

    cfg = SketchformerConfig(
        vocab_size=60, num_classes=5, max_len=24, d_model=32,
        num_layers=1, num_heads=2, dff=64, dropout=0.0,
        lowerdim=16, num_queries=2, dtype="float32", attn_impl="pallas")
    rng = np.random.default_rng(3)
    B = 5
    ids = rng.integers(4, 60, size=(B, 24)).astype(np.int32)
    ids[:, -4:] = 0
    enc = jnp.asarray(ids)
    dec_in = jnp.roll(enc, 1, axis=1).at[:, 0].set(1)
    tgt = enc
    model_p = Sketchformer(cfg)
    params = model_p.init(jax.random.PRNGKey(0), enc, dec_in)["params"]
    model_x = Sketchformer(dataclasses.replace(cfg, attn_impl="xla"))

    def run(model, p):
        # deterministic=False: the eval-mode trunk uses the forward-only
        # fused stacks (no VJP); grads always flow through the train path
        out = model.apply({"params": p}, enc, dec_in, tgt,
                          deterministic=False,
                          rngs={"dropout": jax.random.PRNGKey(1)},
                          method=Sketchformer.forward_tok_loss)
        return out["recon_loss"], out["recon_acc"]

    lp, ap = run(model_p, params)
    lx, ax = run(model_x, params)
    np.testing.assert_allclose(float(lp), float(lx), rtol=2e-5)
    np.testing.assert_allclose(float(ap), float(ax), rtol=1e-6)

    gp = jax.grad(lambda p: run(model_p, p)[0])(params)
    gx = jax.grad(lambda p: run(model_x, p)[0])(params)
    flat_p = jax.tree_util.tree_leaves_with_path(gp)
    flat_x = dict(jax.tree_util.tree_leaves_with_path(gx))
    assert flat_p
    for path, leaf in flat_p:
        ref = flat_x[path]
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(ref), rtol=5e-4, atol=5e-5,
            err_msg=jax.tree_util.keystr(path))
