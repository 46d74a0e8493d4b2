"""Fused encoder-stack kernel == composed flax path (interpret mode on CPU).

Pins the fast inference engine (infer/fast_encode.py + ops/pallas_encoder.py)
to the flax module it re-implements: any drift between the serving path and
the training path is a correctness bug, caught here.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sketchformer_tpu.infer.fast_encode import (
    fast_embed,
    make_fast_embed_fn,
    supports_fast_path,
)
from sketchformer_tpu.models import Sketchformer, SketchformerConfig


def _model(**over):
    kw = dict(
        vocab_size=64, num_classes=5, max_len=48, d_model=32, num_layers=2,
        num_heads=4, dff=64, dropout=0.0, lowerdim=16, num_queries=2,
        dtype="float32", attn_impl="xla")
    kw.update(over)
    cfg = SketchformerConfig(**kw)
    model = Sketchformer(cfg)
    rng = np.random.default_rng(0)
    if cfg.use_continuous:
        enc = jnp.asarray(
            rng.standard_normal((4, cfg.max_len, 3)).astype(np.float32))
        dec_in = enc
        params = model.init(jax.random.PRNGKey(0), enc, dec_in)["params"]
        mask = np.ones((4, cfg.max_len), np.float32)
        mask[:, -6:] = 0.0
        return model, params, enc, jnp.asarray(mask)
    ids = rng.integers(4, cfg.vocab_size, (4, cfg.max_len)).astype(np.int32)
    ids[:, -6:] = 0
    enc = jnp.asarray(ids)
    dec_in = jnp.roll(enc, 1, axis=1).at[:, 0].set(1)
    params = model.init(jax.random.PRNGKey(0), enc, dec_in)["params"]
    return model, params, enc, None


def _ref_embed(model, params, enc, mask):
    return model.apply({"params": params}, enc, mask,
                       method=Sketchformer.embed)


@pytest.mark.slow
@pytest.mark.parametrize("qk_norm", [False, True])
def test_fast_embed_matches_flax_tok(qk_norm):
    model, params, enc, _ = _model(qk_norm=qk_norm)
    ref = _ref_embed(model, params, enc, None)
    got = fast_embed(model, params, enc)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_fast_embed_matches_flax_cont():
    model, params, enc, mask = _model(use_continuous=True)
    ref = _ref_embed(model, params, enc, mask)
    got = fast_embed(model, params, enc, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("mode", ["mean", "direct"])
def test_fast_embed_other_bottlenecks(mode):
    model, params, enc, _ = _model(bottleneck_mode=mode)
    ref = _ref_embed(model, params, enc, None)
    got = fast_embed(model, params, enc)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_fast_embed_flagship_geometry():
    """The bench shape family: head_dim=128, pre-LN, token mode."""
    model, params, enc, _ = _model(
        d_model=256, num_heads=2, dff=512, num_layers=2, max_len=96,
        lowerdim=256)
    ref = _ref_embed(model, params, enc, None)
    got = fast_embed(model, params, enc)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.slow
@pytest.mark.parametrize("heads,qk_norm", [(8, False), (8, True), (4, False)])
def test_fast_embed_packed_small_heads(heads, qk_norm):
    """The reference head geometry (head_dim < 128): packed group path.

    num_heads=8 / d_model=256 is SURVEY.md §2's Sketchformer geometry;
    pallas_packed runs 128//Dh heads per lane pane. Also covers H=4
    (Dh=64, hpp=2)."""
    model, params, enc, _ = _model(
        d_model=256, num_heads=heads, dff=512, num_layers=2, max_len=48,
        lowerdim=256, qk_norm=qk_norm)
    ref = _ref_embed(model, params, enc, None)
    got = fast_embed(model, params, enc)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=3e-5)


def test_fast_embed_jitted_fn():
    model, params, enc, _ = _model()
    f = make_fast_embed_fn(model)
    ref = _ref_embed(model, params, enc, None)
    np.testing.assert_allclose(np.asarray(f(params, enc)), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_fast_embed_fallback_post_ln():
    """norm_first=False isn't fused — must fall back to model.apply."""
    model, params, enc, _ = _model(norm_first=False)
    assert not supports_fast_path(model)
    ref = _ref_embed(model, params, enc, None)
    got = fast_embed(model, params, enc)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
