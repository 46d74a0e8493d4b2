"""Native C batcher vs numpy reference: exact equivalence + hot-loop perf."""

import time

import numpy as np
import pytest

from sketchformer_tpu.data import synthetic
from sketchformer_tpu.data.pipeline import (
    _ragged_concat,
    make_batch_cont,
    make_batch_tok,
)
from sketchformer_tpu.data.tokenizer import GridTokenizer, encode_batch
from sketchformer_tpu.native import get_batcher

native = get_batcher()
pytestmark = pytest.mark.skipif(
    native is None, reason="native batcher unavailable (no C toolchain)")


def _dataset(n_classes=6, per_class=20, seed=0):
    return synthetic.generate_dataset(n_classes, per_class, seed=seed)


def test_grid_encode_exact_equivalence():
    sks, _ = _dataset()
    points, offsets = _ragged_concat(sks)
    for res, max_len in ((100, 128), (10, 32), (255, 256)):
        ids_c, len_c = native.grid_encode_batch(points, offsets, res, max_len)
        ids_py, len_py = encode_batch(GridTokenizer(res), sks, max_len)
        np.testing.assert_array_equal(ids_c, ids_py)
        np.testing.assert_array_equal(len_c, len_py)


def test_grid_encode_empty_sketch():
    sks = [np.zeros((0, 3), np.float32), np.ones((3, 3), np.float32)]
    points, offsets = _ragged_concat(sks)
    ids_c, len_c = native.grid_encode_batch(points, offsets, 10, 16)
    assert ids_c[0, 0] == 2 and len_c[0] == 1  # EOS only
    assert len_c[1] > 1


def test_cont_batch_exact_equivalence():
    sks, labels = _dataset()
    b_c = make_batch_cont(sks, labels, max_len=128, scale=31.7, native=True)
    b_py = make_batch_cont(sks, labels, max_len=128, scale=31.7, native=False)
    assert set(b_c) == set(b_py)
    for k in b_py:
        np.testing.assert_array_equal(b_c[k], b_py[k], err_msg=k)


def test_tok_batch_native_path_equivalence():
    sks, labels = _dataset()
    tok = GridTokenizer(100)
    b_c = make_batch_tok(tok, sks, labels, max_len=128, native=True)
    b_py = make_batch_tok(tok, sks, labels, max_len=128, native=False)
    for k in b_py:
        np.testing.assert_array_equal(b_c[k], b_py[k], err_msg=k)


def test_bad_inputs_raise():
    with pytest.raises(ValueError):
        native.grid_encode_batch(
            np.zeros((4, 2), np.float32), np.asarray([0, 4], np.int64), 10, 16)
    with pytest.raises(ValueError):
        native.grid_encode_batch(
            np.zeros((4, 3), np.float32), np.asarray([0, 9], np.int64), 10, 16)


def test_native_is_faster_on_big_batch():
    sks, _ = _dataset(per_class=80)
    points, offsets = _ragged_concat(sks)
    tok = GridTokenizer(100)
    t0 = time.perf_counter()
    for _ in range(5):
        native.grid_encode_batch(points, offsets, 100, 128)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    encode_batch(tok, sks, 128)
    t_py = time.perf_counter() - t0
    # 5 native passes still beat one python pass on any sane machine
    assert t_native < t_py, (t_native, t_py)
