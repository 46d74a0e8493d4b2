"""Fast whole-stack decode == composed KV-cached decode (CPU interpret).

Pins infer/fast_decode.py + ops/pallas_decode_stack.py to the composed
path of infer/decode.py: identical greedy token ids, including EOS
early-exit and PAD-after-finish semantics.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sketchformer_tpu.infer import decode as dec
from sketchformer_tpu.infer.fast_decode import (
    make_fast_token_decoder,
    make_fast_token_decoder_from_z,
    supports_fast_decode,
)
from sketchformer_tpu.models import Sketchformer, SketchformerConfig

# full-tier only: heavy kernel/equivalence coverage (pyproject two-tier note)
pytestmark = pytest.mark.slow


def _tok_model(seed=0, **over):
    kw = dict(
        vocab_size=64, num_classes=5, max_len=32, d_model=32, num_layers=2,
        num_heads=2, dff=64, dropout=0.0, lowerdim=16, num_queries=2,
        dtype="float32", attn_impl="xla")
    kw.update(over)
    cfg = SketchformerConfig(**kw)
    model = Sketchformer(cfg)
    rng = np.random.default_rng(seed)
    ids = rng.integers(4, cfg.vocab_size, (4, cfg.max_len)).astype(np.int32)
    ids[:, -6:] = 0
    enc = jnp.asarray(ids)
    dec_in = jnp.roll(enc, 1, axis=1).at[:, 0].set(1)
    params = model.init(jax.random.PRNGKey(seed), enc, dec_in)["params"]
    return model, params, enc


@pytest.mark.parametrize("qk_norm", [False, True])
def test_fast_decode_matches_composed(qk_norm):
    model, params, enc = _tok_model(qk_norm=qk_norm)
    ref = np.asarray(dec.make_token_decoder(model, fast=False)(params, enc))
    got = np.asarray(make_fast_token_decoder(model)(params, enc))
    np.testing.assert_array_equal(got, ref)


def test_fast_decode_from_z_matches_composed():
    model, params, enc = _tok_model(seed=1)
    z, _, _ = model.apply({"params": params}, enc,
                          method=Sketchformer.encode)
    ref = np.asarray(
        dec.make_token_decoder_from_z(model, fast=False)(params, z))
    got = np.asarray(make_fast_token_decoder_from_z(model)(params, z))
    np.testing.assert_array_equal(got, ref)


def test_fast_decode_flagship_geometry():
    """head_dim=128 (the bench shape family)."""
    model, params, enc = _tok_model(
        seed=2, d_model=256, num_heads=2, dff=512, num_layers=2,
        lowerdim=64)
    ref = np.asarray(dec.make_token_decoder(model, fast=False)(params, enc))
    got = np.asarray(make_fast_token_decoder(model)(params, enc))
    np.testing.assert_array_equal(got, ref)


def test_fast_decode_fallback_direct_mode():
    model, params, enc = _tok_model(seed=3, bottleneck_mode="direct")
    assert not supports_fast_decode(model)
    ref = np.asarray(dec.make_token_decoder(model, fast=False)(params, enc))
    got = np.asarray(make_fast_token_decoder(model)(params, enc))
    np.testing.assert_array_equal(got, ref)
