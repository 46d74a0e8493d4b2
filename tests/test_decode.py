"""Decode equivalence (SURVEY.md §4.3): KV-cached greedy decode must equal
the uncached rescore-the-prefix decode the reference effectively performs."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from sketchformer_tpu.data.pipeline import PEN_END
from sketchformer_tpu.data.tokenizer import EOS_ID, PAD_ID, SOS_ID
from sketchformer_tpu.infer import decode as dec
from sketchformer_tpu.models import Sketchformer, SketchformerConfig

TINY = dict(
    vocab_size=36, num_classes=4, max_len=24, d_model=32, num_layers=2,
    num_heads=4, dff=64, dropout=0.0, lowerdim=16, num_queries=2,
)


def _tok_model(seed=0, **over):
    cfg = SketchformerConfig(**{**TINY, **over})
    model = Sketchformer(cfg)
    rng = np.random.default_rng(seed)
    enc = rng.integers(4, cfg.vocab_size, size=(3, cfg.max_len)).astype(np.int32)
    enc[:, -6:] = 0
    enc[:, -7] = EOS_ID
    dec_in = np.roll(enc, 1, axis=1)
    dec_in[:, 0] = SOS_ID
    params = model.init(jax.random.PRNGKey(seed), jnp.asarray(enc),
                        jnp.asarray(dec_in))["params"]
    return model, params, jnp.asarray(enc)


def _uncached_greedy(model, params, enc, T):
    """Reference decode: re-run the full teacher-forced decoder per step."""
    B = enc.shape[0]
    ids = np.full((B, T), PAD_ID, np.int32)
    finished = np.zeros(B, bool)
    for t in range(T):
        dec_in = np.full((B, T), PAD_ID, np.int32)
        dec_in[:, 0] = SOS_ID
        if t > 0:
            dec_in[:, 1 : t + 1] = ids[:, :t]
        out = model.apply({"params": params}, enc, jnp.asarray(dec_in))
        logits = np.array(out["recon"][:, t])
        logits[:, PAD_ID] = -1e9
        logits[:, SOS_ID] = -1e9
        nxt = logits.argmax(axis=-1).astype(np.int32)
        nxt[finished] = PAD_ID
        ids[:, t] = nxt
        finished |= nxt == EOS_ID
    return ids


@pytest.mark.slow
def test_cached_equals_uncached_token_decode():
    model, params, enc = _tok_model(seed=0)
    T = model.config.max_len
    cached = np.asarray(dec.make_token_decoder(model)(params, enc))
    uncached = _uncached_greedy(model, params, enc, T)
    np.testing.assert_array_equal(cached, uncached)


@pytest.mark.slow
def test_cached_equals_uncached_multiple_seeds():
    for seed in (1, 2):
        model, params, enc = _tok_model(seed=seed)
        cached = np.asarray(dec.make_token_decoder(model)(params, enc))
        uncached = _uncached_greedy(model, params, enc, model.config.max_len)
        np.testing.assert_array_equal(cached, uncached)


def test_decode_from_z_matches_decode_from_enc():
    model, params, enc = _tok_model(seed=3)
    ids1 = dec.make_token_decoder(model)(params, enc)
    z = model.apply({"params": params}, enc, method=Sketchformer.embed)
    ids2 = dec.make_token_decoder_from_z(model)(params, z)
    np.testing.assert_array_equal(np.asarray(ids1), np.asarray(ids2))


def test_rows_stop_independently():
    model, params, enc = _tok_model(seed=4)
    ids = np.asarray(dec.make_token_decoder(model)(params, enc))
    for row in ids:
        eos = np.flatnonzero(row == EOS_ID)
        if len(eos):
            assert (row[eos[0] + 1 :] == PAD_ID).all()


def test_cont_decode_runs_and_masks_after_end():
    cfg_over = dict(use_continuous=True, num_mixtures=3)
    cfg = SketchformerConfig(**{**TINY, **cfg_over})
    model = Sketchformer(cfg)
    rng = np.random.default_rng(0)
    B, T = 2, cfg.max_len
    enc = jnp.asarray(rng.standard_normal((B, T, 3)).astype(np.float32))
    mask = jnp.ones((B, T), jnp.float32)
    dec_in = jnp.asarray(rng.standard_normal((B, T, 5)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), enc, dec_in, mask, mask)["params"]
    decode = dec.make_cont_decoder(model, temperature=0.6)
    xy, pen, valid = decode(params, enc, mask, jax.random.PRNGKey(1))
    assert xy.shape == (B, T, 2) and pen.shape == (B, T)
    xy, pen, valid = map(np.asarray, (xy, pen, valid))
    assert np.isfinite(xy).all()
    # after a row finishes, xy must be zeroed and valid False
    for i in range(B):
        ends = np.flatnonzero(pen[i] == PEN_END)
        if len(ends):
            e = ends[0]
            assert not valid[i, e + 1 :].any()
            np.testing.assert_array_equal(xy[i, e + 1 :], 0.0)


def test_cont_to_sketches_roundtrip_shape():
    xy = np.asarray([[[1.0, 2.0], [3.0, 4.0], [0.0, 0.0]]])
    pen = np.asarray([[0, 1, PEN_END]])
    valid = np.asarray([[True, True, True]])
    sks = dec.cont_to_sketches(xy, pen, valid, scale=2.0)
    assert len(sks) == 1
    np.testing.assert_allclose(sks[0], [[2, 4, 0], [6, 8, 1]])


@pytest.mark.slow
def test_early_exit_equals_scan_token():
    """while_loop early-exit decode == fixed-T scan decode, bit-exact."""
    for seed in (0, 5):
        model, params, enc = _tok_model(seed=seed)
        fast = np.asarray(
            dec.make_token_decoder(model, early_exit=True)(params, enc))
        full = np.asarray(
            dec.make_token_decoder(model, early_exit=False)(params, enc))
        np.testing.assert_array_equal(fast, full)


def test_early_exit_equals_scan_token_from_z():
    model, params, enc = _tok_model(seed=6)
    z = model.apply({"params": params}, enc, method=Sketchformer.embed)
    fast = np.asarray(
        dec.make_token_decoder_from_z(model, early_exit=True)(params, z))
    full = np.asarray(
        dec.make_token_decoder_from_z(model, early_exit=False)(params, z))
    np.testing.assert_array_equal(fast, full)


def test_early_exit_equals_scan_cont():
    cfg = SketchformerConfig(**{**TINY, "use_continuous": True,
                                "num_mixtures": 3})
    model = Sketchformer(cfg)
    rng = np.random.default_rng(2)
    B, T = 2, cfg.max_len
    enc = jnp.asarray(rng.standard_normal((B, T, 3)).astype(np.float32))
    mask = jnp.ones((B, T), jnp.float32)
    dec_in = jnp.asarray(rng.standard_normal((B, T, 5)).astype(np.float32))
    params = model.init(
        jax.random.PRNGKey(0), enc, dec_in, mask, mask)["params"]
    key = jax.random.PRNGKey(3)
    outs = {}
    for ee in (True, False):
        decode = dec.make_cont_decoder(model, temperature=0.6, early_exit=ee)
        outs[ee] = tuple(
            np.asarray(x) for x in decode(params, enc, mask, key))
    for a, b in zip(outs[True], outs[False]):
        np.testing.assert_array_equal(a, b)


def test_cache_pad_regression():
    """The KV cache must keep CACHE_PAD spare slots beyond max_len — a TPU
    runtime bug NaNs any decode whose loop length equals the cache length
    (repro: tools/repro_scan_cache_nan.py). Pin the pad so a refactor can't
    silently remove it."""
    model, params, enc = _tok_model(seed=0)
    cfg = model.config
    _, memory, memory_mask = model.apply(
        {"params": params}, enc, method=Sketchformer.encode)
    cache = dec._build_cache(model, params, enc.shape[0], memory, memory_mask)
    leaf = cache["decoder"]["layer_0"]["self_attn"]["cached_key"]
    assert Sketchformer.CACHE_PAD >= 8
    assert leaf.shape[1] == cfg.max_len + Sketchformer.CACHE_PAD
    # the repro override exists and actually changes the allocation
    tight = dec._build_cache(
        model, params, enc.shape[0], memory, memory_mask, cache_pad=0)
    assert tight["decoder"]["layer_0"]["self_attn"]["cached_key"].shape[1] \
        == cfg.max_len
