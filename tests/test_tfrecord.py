import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from sketchformer_tpu.data import synthetic
from sketchformer_tpu.data.registry import get_dataloader_by_name
from sketchformer_tpu.data.tfrecord import (
    TFRecordSketchDataset,
    write_tfrecord_shards,
)


def test_tfrecord_roundtrip(tmp_path):
    sketches, labels = synthetic.generate_dataset(3, 12, seed=0)
    write_tfrecord_shards(
        str(tmp_path), sketches, labels, ["a", "b", "c"], shard_size=8, seed=0)
    ds = TFRecordSketchDataset(str(tmp_path))
    assert ds.num_classes == 3 and ds.scale > 0
    total = 0
    for split in ("train", "valid", "test"):
        for sk, lb in ds.iter_sketches(split):
            assert sk.dtype == np.float32 and sk.shape[1] == 3
            assert 0 <= lb < 3
            total += 1
    assert total == 36


def test_tfrecord_loader_batches(tmp_path):
    sketches, labels = synthetic.generate_dataset(3, 24, seed=1)
    write_tfrecord_shards(
        str(tmp_path), sketches, labels, ["a", "b", "c"], shard_size=16)
    loader = get_dataloader_by_name("tfrecord_stroke3")(
        str(tmp_path), batch_size=8, buckets=(64, 128))
    batches = list(loader.batch_iterator("train"))
    assert batches and all(b["enc"].shape[0] == 8 for b in batches)
