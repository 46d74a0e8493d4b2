import numpy as np

from sketchformer_tpu.data import stroke3, synthetic
from sketchformer_tpu.data.tokenizer import (
    EOS_ID,
    PAD_ID,
    SEP_ID,
    SOS_ID,
    DictionaryTokenizer,
    GridTokenizer,
    encode_batch,
)


def _abs_coords(strokes):
    return np.cumsum(strokes[:, :2], axis=0)


def test_grid_roundtrip_within_resolution():
    tok = GridTokenizer(resolution=128)
    sk = synthetic.generate_sketch(3, np.random.default_rng(0))
    ids = tok.encode(sk)
    back = tok.decode(ids)
    assert back.shape[0] == sk.shape[0]
    # pen lifts survive exactly
    np.testing.assert_array_equal(back[:, 2], sk[:, 2])
    # absolute geometry survives to within one grid cell (in unit space)
    unit_orig = tok._to_unit(sk)
    unit_back = _abs_coords(back)
    assert np.max(np.abs(unit_back - unit_orig)) <= 1.5 / tok.resolution


def test_grid_vocab_and_specials():
    tok = GridTokenizer(resolution=10)
    assert tok.vocab_size == 104
    sk = synthetic.generate_sketch(0, np.random.default_rng(1))
    ids = tok.encode(sk)
    assert ids.max() < tok.vocab_size
    assert ids.min() >= SEP_ID  # no PAD/SOS/EOS inside raw encoding
    assert ids[-1] == SEP_ID  # last point ends a stroke


def test_grid_decode_ignores_specials_and_stops_at_eos():
    tok = GridTokenizer(resolution=10)
    sk = synthetic.generate_sketch(2, np.random.default_rng(2))
    ids = tok.encode(sk)
    wrapped = np.concatenate([[SOS_ID], ids, [EOS_ID], [77, 88], [PAD_ID] * 3])
    np.testing.assert_array_equal(tok.decode(wrapped), tok.decode(ids))


def test_dictionary_fit_and_roundtrip():
    sketches, _ = synthetic.generate_dataset(4, 16, seed=0)
    norm = [stroke3.normalize(s, 30.0) for s in sketches]
    tok = DictionaryTokenizer.fit(norm, num_tokens=64, iters=10, seed=0)
    assert tok.vocab_size == 68
    s = norm[0]
    back = tok.decode(tok.encode(s))
    assert back.shape == s.shape
    np.testing.assert_array_equal(back[:, 2], s[:, 2])
    # quantization error bounded by codebook granularity: decoded deltas are
    # actual centroids, so per-step error <= max distance to nearest centroid
    err = np.abs(back[:, :2] - s[:, :2]).max()
    assert err < 1.0


def test_dictionary_save_load(tmp_path):
    tok = DictionaryTokenizer(np.random.default_rng(0).standard_normal((32, 2)))
    p = str(tmp_path / "dict.npz")
    tok.save(p)
    tok2 = DictionaryTokenizer.load(p)
    np.testing.assert_array_equal(tok.centroids, tok2.centroids)


def test_encode_batch_shapes_and_eos():
    tok = GridTokenizer(resolution=16)
    sketches = [
        synthetic.generate_sketch(i, np.random.default_rng(i)) for i in range(3)
    ]
    ids, lengths = encode_batch(tok, sketches, max_len=64)
    assert ids.shape == (3, 64)
    for i in range(3):
        assert ids[i, lengths[i] - 1] == EOS_ID
        assert (ids[i, lengths[i]:] == PAD_ID).all()


def test_encode_batch_truncation():
    tok = GridTokenizer(resolution=16)
    sk = synthetic.generate_sketch(10, np.random.default_rng(0))
    ids, lengths = encode_batch(tok, [sk], max_len=8)
    assert lengths[0] == 8
    assert ids[0, 7] == EOS_ID
