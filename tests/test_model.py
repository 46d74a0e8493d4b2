import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sketchformer_tpu.models import Sketchformer, SketchformerConfig, get_model_by_name
from sketchformer_tpu.models.attention import (
    causal_mask,
    combine_masks,
    dot_product_attention,
    padding_mask_from_ids,
)
from sketchformer_tpu.models.embeddings import sinusoidal_position_encoding


TINY = dict(
    vocab_size=68, num_classes=5, max_len=32, d_model=32, num_layers=2,
    num_heads=4, dff=64, dropout=0.0, lowerdim=16, num_queries=2,
)


def _tok_batch(rng, B=4, L=32, vocab=68):
    ids = rng.integers(4, vocab, size=(B, L)).astype(np.int32)
    ids[:, -4:] = 0  # PAD tail
    ids[:, -5] = 2   # EOS
    dec_in = np.zeros_like(ids)
    dec_in[:, 0] = 1
    dec_in[:, 1:] = ids[:, :-1]
    return {
        "enc": jnp.asarray(ids),
        "dec_in": jnp.asarray(dec_in),
        "dec_tgt": jnp.asarray(ids),
        "label": jnp.asarray(rng.integers(0, 5, size=B).astype(np.int32)),
    }


def test_posenc_table():
    t = sinusoidal_position_encoding(50, 16)
    assert t.shape == (50, 16)
    np.testing.assert_allclose(t[0], np.tile([0.0, 1.0], 8), atol=1e-6)
    # rows are unit-ish: sin^2 + cos^2 pairs sum to 1
    pairs = t[:, 0::2] ** 2 + t[:, 1::2] ** 2
    np.testing.assert_allclose(pairs, 1.0, atol=1e-5)


def test_masks():
    ids = jnp.asarray([[5, 6, 0, 0]])
    m = padding_mask_from_ids(ids)
    assert m.shape == (1, 1, 1, 4)
    np.testing.assert_array_equal(np.asarray(m)[0, 0, 0], [1, 1, 0, 0])
    c = causal_mask(3)
    np.testing.assert_array_equal(
        np.asarray(c)[0, 0], [[1, 0, 0], [1, 1, 0], [1, 1, 1]]
    )
    both = combine_masks(c, None, m[..., :3])
    assert both.shape == (1, 1, 3, 3)


def test_attention_masking_blocks_padded_keys():
    rng = jax.random.PRNGKey(0)
    q = jax.random.normal(rng, (1, 4, 2, 8))
    k = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 2, 8))
    v = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 2, 8))
    mask = jnp.asarray([True, True, False, False])[None, None, None, :]
    out = dot_product_attention(q, k, v, mask=mask)
    # changing masked-out values must not change the output
    v2 = v.at[:, 2:].set(99.0)
    out2 = dot_product_attention(q, k, v2, mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-6)


def test_tok_forward_shapes():
    model = Sketchformer(SketchformerConfig(**TINY))
    batch = _tok_batch(np.random.default_rng(0))
    params = model.init(jax.random.PRNGKey(0), batch["enc"], batch["dec_in"])
    out = model.apply(params, batch["enc"], batch["dec_in"])
    assert out["recon"].shape == (4, 32, 68)
    assert out["cls"].shape == (4, 5)
    assert out["embedding"].shape == (4, 16)
    assert out["recon"].dtype == jnp.float32


def test_cont_forward_shapes():
    cfg = SketchformerConfig(**{**TINY, "use_continuous": True, "num_mixtures": 5})
    model = Sketchformer(cfg)
    rng = np.random.default_rng(0)
    enc = jnp.asarray(rng.standard_normal((4, 32, 3)).astype(np.float32))
    dec_in = jnp.asarray(rng.standard_normal((4, 32, 5)).astype(np.float32))
    mask = jnp.ones((4, 32), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), enc, dec_in, mask, mask)
    out = model.apply(params, enc, dec_in, mask, mask)
    assert out["recon"].shape == (4, 32, 6 * 5 + 3)
    assert out["cls"].shape == (4, 5)


@pytest.mark.parametrize("mode", ["attn", "mean", "direct"])
def test_bottleneck_modes(mode):
    cfg = SketchformerConfig(**{**TINY, "bottleneck_mode": mode})
    model = Sketchformer(cfg)
    batch = _tok_batch(np.random.default_rng(1))
    params = model.init(jax.random.PRNGKey(0), batch["enc"], batch["dec_in"])
    out = model.apply(params, batch["enc"], batch["dec_in"])
    assert out["embedding"].shape == (4, 16)
    assert np.isfinite(np.asarray(out["recon"])).all()


def test_bottleneck_blocks_encoder_leak():
    """In attn mode the decoder sees ONLY z: perturbing encoder inputs while
    keeping z fixed is impossible, but padded-position perturbations must not
    leak through."""
    cfg = SketchformerConfig(**TINY)
    model = Sketchformer(cfg)
    batch = _tok_batch(np.random.default_rng(2))
    params = model.init(jax.random.PRNGKey(0), batch["enc"], batch["dec_in"])
    out1 = model.apply(params, batch["enc"], batch["dec_in"])
    # change PAD-position tokens of encoder input -> masked -> no effect
    enc2 = np.asarray(batch["enc"]).copy()
    # Note: enc tokens equal to PAD are masked; replacing them with PAD again
    # is identity, so instead verify embedding determinism
    out2 = model.apply(params, jnp.asarray(enc2), batch["dec_in"])
    np.testing.assert_allclose(
        np.asarray(out1["embedding"]), np.asarray(out2["embedding"]), atol=0)


def test_registry_builders():
    build = get_model_by_name("sketchformer")
    m = build(**TINY)
    assert isinstance(m, Sketchformer)
    assert not m.config.use_continuous
    m2 = get_model_by_name("sketchformer-cont")(**TINY)
    assert m2.config.use_continuous


def test_default_hparams_roundtrip():
    hps = SketchformerConfig.default_hparams()
    hps.parse("d_model=64,num_layers=2,dtype=bfloat16")
    cfg = SketchformerConfig.from_hparams(hps)
    assert cfg.d_model == 64 and cfg.compute_dtype == jnp.bfloat16


def test_pallas_and_xla_impls_agree_on_full_model():
    """Same params (shapes/names identical), different attention backends."""
    batch = _tok_batch(np.random.default_rng(5))
    cfg_x = SketchformerConfig(**TINY)
    cfg_p = SketchformerConfig(**{**TINY, "attn_impl": "pallas"})
    mx, mp = Sketchformer(cfg_x), Sketchformer(cfg_p)
    params = mx.init(jax.random.PRNGKey(0), batch["enc"], batch["dec_in"])
    out_x = mx.apply(params, batch["enc"], batch["dec_in"])
    out_p = mp.apply(params, batch["enc"], batch["dec_in"])
    np.testing.assert_allclose(
        np.asarray(out_x["recon"]), np.asarray(out_p["recon"]),
        atol=5e-5, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out_x["embedding"]), np.asarray(out_p["embedding"]),
        atol=5e-5, rtol=1e-4)


def test_fused_gate_falls_back_beyond_max_fused_len():
    """pallas configs with seq > MAX_FUSED_LEN must take the composed path
    (round-1 contract: long sequences fall back to XLA, never crash)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from sketchformer_tpu.models.transformer import Encoder
    from sketchformer_tpu.ops.pallas_encoder import MAX_FUSED_LEN

    T = MAX_FUSED_LEN + 32
    enc_p = Encoder(num_layers=1, num_heads=2, d_model=32, dff=64,
                    dropout=0.0, dtype=jnp.float32, attn_impl="pallas",
                    norm_first=True)
    enc_x = Encoder(num_layers=1, num_heads=2, d_model=32, dff=64,
                    dropout=0.0, dtype=jnp.float32, attn_impl="xla",
                    norm_first=True)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, T, 32)),
        jnp.float32)
    params = enc_x.init(jax.random.PRNGKey(0), x)["params"]
    ref = enc_x.apply({"params": params}, x)
    got = enc_p.apply({"params": params}, x)  # must not raise
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_mha_combines_legacy_mask_with_causal():
    """Passing a 4-D mask AND causal=True must apply BOTH (regression:
    the structured args were silently dropped)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from sketchformer_tpu.models.attention import (
        MultiHeadAttention, causal_mask, combine_masks,
        padding_mask_from_ids)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 12, 16)), jnp.float32)
    ids = jnp.asarray(rng.integers(1, 5, (2, 12)).astype(np.int32))
    ids = ids.at[:, -3:].set(0)
    mha = MultiHeadAttention(2, 16, 0.0, jnp.float32, "xla")
    pad4d = padding_mask_from_ids(ids)
    params = mha.init(jax.random.PRNGKey(0), x, x)["params"]
    # oracle: explicit combined mask
    ref = mha.apply({"params": params}, x, x,
                    mask=combine_masks(pad4d, causal_mask(12)))
    got = mha.apply({"params": params}, x, x, mask=pad4d, causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
