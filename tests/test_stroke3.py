import numpy as np
import pytest

from sketchformer_tpu.data import stroke3, synthetic


def test_lines_strokes_roundtrip():
    rng = np.random.default_rng(0)
    lines = [rng.standard_normal((k, 2)).astype(np.float32) for k in (5, 3, 8)]
    strokes = stroke3.lines_to_strokes(lines)
    assert strokes.shape == (16, 3)
    back = stroke3.strokes_to_lines(strokes)
    assert len(back) == 3
    # absolute coordinates are recovered exactly up to fp accumulation
    orig = np.concatenate(lines)
    rec = np.concatenate(back)
    np.testing.assert_allclose(rec, orig, atol=1e-4)


def test_pen_lift_positions():
    lines = [np.zeros((2, 2), np.float32), np.ones((3, 2), np.float32)]
    strokes = stroke3.lines_to_strokes(lines)
    np.testing.assert_array_equal(strokes[:, 2], [0, 1, 0, 0, 1])


def test_normalize_roundtrip():
    rng = np.random.default_rng(1)
    s = rng.standard_normal((20, 3)).astype(np.float32) * 10
    scale = stroke3.compute_deviation([s])
    n = stroke3.normalize(s, scale)
    assert abs(np.std(n[:, :2]) - 1.0) < 1e-5
    back = stroke3.denormalize(n, scale)
    np.testing.assert_allclose(back, s, rtol=1e-5)
    # pen column untouched
    np.testing.assert_array_equal(n[:, 2], s[:, 2])


def test_rdp_keeps_endpoints_and_reduces():
    # dense noisy-but-straightish line: RDP should reduce heavily
    t = np.linspace(0, 100, 200)
    line = np.stack([t, 0.1 * np.sin(t * 0.05)], axis=1).astype(np.float32)
    strokes = stroke3.lines_to_strokes([line])
    simp = stroke3.rdp_simplify(strokes, epsilon=2.0)
    assert len(simp) < len(strokes) / 4
    # endpoints preserved in absolute space
    orig_end = np.cumsum(strokes[:, :2], axis=0)[-1]
    simp_end = np.cumsum(simp[:, :2], axis=0)[-1]
    np.testing.assert_allclose(simp_end, orig_end, atol=1e-3)


def test_rdp_preserves_corners():
    line = np.array(
        [[0, 0], [1, 0.01], [2, 0], [2, 1], [2, 2]], dtype=np.float32
    ) * 10
    strokes = stroke3.lines_to_strokes([line])
    simp = stroke3.rdp_simplify(strokes, epsilon=0.5)
    coords = np.cumsum(simp[:, :2], axis=0)
    # the sharp corner at (20, 0) must survive
    assert np.min(np.linalg.norm(coords - np.array([20, 0]), axis=1)) < 1e-3


def test_pad_batch():
    sketches = [np.ones((5, 3), np.float32), np.ones((12, 3), np.float32)]
    padded, lengths = stroke3.pad_batch(sketches, max_len=8)
    assert padded.shape == (2, 8, 3)
    np.testing.assert_array_equal(lengths, [5, 8])
    assert padded[0, 5:].sum() == 0


def test_rasterize():
    sk = synthetic.generate_sketch(5, np.random.default_rng(0))
    img = stroke3.rasterize(sk, side=48)
    assert img.shape == (48, 48)
    assert 0.0 < img.mean() < 0.5


def test_synthetic_classes_differ():
    rng = np.random.default_rng(0)
    a = synthetic.generate_sketch(0, rng)
    b = synthetic.generate_sketch(1, rng)
    assert a.shape[1] == 3 and b.shape[1] == 3
    assert len(a) != len(b) or not np.allclose(a, b)


def test_synthetic_dataset_shuffled_and_labeled():
    sketches, labels = synthetic.generate_dataset(4, 8, seed=0)
    assert len(sketches) == 32
    assert sorted(np.bincount(labels)) == [8, 8, 8, 8]
