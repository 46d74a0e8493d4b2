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


def test_fast_decode_reference_head_geometry():
    """The reference's small-head shape family (head_dim=32, SURVEY §2):
    served by the lane-PACKED chunk kernel (ops/pallas_decode_packed.py)
    on TPU and interpret alike — round 3.3 lifted the TPU decline (the
    folded kernel's sub-lane head fold is what Mosaic rejects; packing
    heads into lanes with indicator-matmul segment reductions keeps the
    per-step op count constant in H). Exact ids vs the composed oracle."""
    model, params, enc = _tok_model(
        seed=4, d_model=256, num_heads=8, dff=512, num_layers=2,
        lowerdim=64)
    from sketchformer_tpu.infer.fast_decode import fast_decode_support
    assert fast_decode_support(model, backend="tpu")[0]
    assert fast_decode_support(model, backend="cpu")[0]
    ref = np.asarray(dec.make_token_decoder(model, fast=False)(params, enc))
    got = np.asarray(make_fast_token_decoder(model)(params, enc))
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("k", [4, 8, 32])
def test_fast_decode_steps_per_call_sweep(k):
    """Chunk K (early-exit granularity knob, r4: exposed through
    make_token_decoder for the realistic-decode bench) must not change
    the decoded ids — only when the while_loop can stop."""
    model, params, enc = _tok_model()
    ref = np.asarray(dec.make_token_decoder(model, fast=False)(params, enc))
    got = np.asarray(
        dec.make_token_decoder(model, steps_per_call=k)(params, enc))
    np.testing.assert_array_equal(got, ref)


def test_fast_decode_chunk_not_dividing_T():
    """max_len not a multiple of steps_per_call: horizon padding + trim."""
    model, params, enc = _tok_model(seed=5, max_len=21)
    ref = np.asarray(
        dec.make_token_decoder(model, fast=False, max_len=21)(params, enc))
    got = np.asarray(
        make_fast_token_decoder(model, max_len=21)(params, enc))
    np.testing.assert_array_equal(got, ref)


def test_fast_decode_fallback_direct_mode():
    model, params, enc = _tok_model(seed=3, bottleneck_mode="direct")
    assert not supports_fast_decode(model)
    ref = np.asarray(dec.make_token_decoder(model, fast=False)(params, enc))
    got = np.asarray(make_fast_token_decoder(model)(params, enc))
    np.testing.assert_array_equal(got, ref)


def _cont_model(seed=0, **over):
    kw = dict(
        vocab_size=64, num_classes=5, max_len=32, d_model=32, num_layers=2,
        num_heads=2, dff=64, dropout=0.0, lowerdim=16, num_queries=2,
        num_mixtures=5, use_continuous=True, dtype="float32",
        attn_impl="xla")
    kw.update(over)
    cfg = SketchformerConfig(**kw)
    model = Sketchformer(cfg)
    rng = np.random.default_rng(seed)
    T = cfg.max_len
    rows = rng.standard_normal((4, T, 5)).astype(np.float32) * 0.5
    rows[..., 2:] = 0.0
    pen = rng.integers(0, 2, (4, T))
    rows[np.arange(4)[:, None], np.arange(T)[None, :], 2 + pen] = 1.0
    rows[:, -4:, 2:] = 0.0
    rows[:, -4:, 4] = 1.0      # PEN_END tail
    enc = jnp.asarray(rows)
    enc_mask = jnp.asarray((np.arange(T)[None, :] < T - 2).repeat(4, 0)
                           .reshape(4, T).astype(np.float32))
    dec_in = enc
    params = model.init(jax.random.PRNGKey(seed), enc, dec_in,
                        enc_mask=enc_mask, dec_key_mask=enc_mask)["params"]
    return model, params, enc, enc_mask


@pytest.mark.parametrize("qk_norm", [False, True])
def test_fast_cont_decode_matches_composed(qk_norm):
    """Greedy MDN chunk engine == composed scan decode (r2 item 5)."""
    from sketchformer_tpu.infer.fast_decode import make_fast_cont_decoder

    model, params, enc, enc_mask = _cont_model(qk_norm=qk_norm)
    rng = jax.random.PRNGKey(3)
    ref_xy, ref_pen, ref_valid = dec.make_cont_decoder(
        model, early_exit=False)(params, enc, enc_mask, rng)
    xy, pen, valid = make_fast_cont_decoder(model)(
        params, enc, enc_mask, rng)
    np.testing.assert_array_equal(np.asarray(pen), np.asarray(ref_pen))
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(ref_valid))
    np.testing.assert_allclose(np.asarray(xy), np.asarray(ref_xy),
                               rtol=1e-5, atol=1e-6)


def test_fast_cont_decode_from_z_matches_composed():
    from sketchformer_tpu.infer.fast_decode import (
        make_fast_cont_decoder_from_z)

    model, params, enc, enc_mask = _cont_model(seed=1)
    rng = jax.random.PRNGKey(4)
    z, _, _ = model.apply({"params": params}, enc, enc_mask,
                          method=Sketchformer.encode)
    ref = dec.make_cont_decoder_from_z(model, early_exit=False)(
        params, z, rng)
    got = make_fast_cont_decoder_from_z(model)(params, z, rng)
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(ref[1]))
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                               rtol=1e-5, atol=1e-6)


def test_fast_cont_decode_reference_head_geometry():
    """MDN greedy decode at the reference's small-head shape family
    (head_dim=32): served by the lane-PACKED cont chunk kernel (round
    3.3) — the same oracle equivalence as the flagship cont test."""
    from sketchformer_tpu.infer.fast_decode import (
        fast_cont_decode_support,
        make_fast_cont_decoder,
    )

    model, params, enc, enc_mask = _cont_model(
        seed=6, d_model=256, num_heads=8, dff=512, num_layers=2,
        lowerdim=64)
    assert fast_cont_decode_support(model, backend="tpu")[0]
    rng = jax.random.PRNGKey(7)
    ref_xy, ref_pen, ref_valid = dec.make_cont_decoder(
        model, early_exit=False)(params, enc, enc_mask, rng)
    xy, pen, valid = make_fast_cont_decoder(model)(
        params, enc, enc_mask, rng)
    np.testing.assert_array_equal(np.asarray(pen), np.asarray(ref_pen))
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(ref_valid))
    np.testing.assert_allclose(np.asarray(xy), np.asarray(ref_xy),
                               rtol=1e-5, atol=1e-6)
