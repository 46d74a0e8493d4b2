import numpy as np
import pytest

from sketchformer_tpu.data.pipeline import (
    BucketBatcher,
    bucket_for_length,
    iterate_batches,
    make_batch_cont,
    make_batch_tok,
    PEN_END,
)
from sketchformer_tpu.data.registry import SyntheticLoader, get_dataloader_by_name
from sketchformer_tpu.data.shards import ShardedDataset, write_shards
from sketchformer_tpu.data.tokenizer import GridTokenizer, PAD_ID, SOS_ID
from sketchformer_tpu.data import synthetic


def test_bucket_for_length():
    buckets = (32, 64, 128)
    assert bucket_for_length(1, buckets) == 32
    assert bucket_for_length(32, buckets) == 32
    assert bucket_for_length(33, buckets) == 64
    assert bucket_for_length(999, buckets) == 128


def test_make_batch_tok_shift():
    tok = GridTokenizer(resolution=16)
    sketches, labels = synthetic.generate_dataset(2, 2, seed=0)
    b = make_batch_tok(tok, sketches, labels, max_len=64)
    assert b["enc"].shape == (4, 64)
    assert (b["dec_in"][:, 0] == SOS_ID).all()
    np.testing.assert_array_equal(b["dec_in"][:, 1:], b["dec_tgt"][:, :-1])


def test_make_batch_cont_teacher_forcing():
    sketches, labels = synthetic.generate_dataset(2, 2, seed=0)
    b = make_batch_cont(sketches, labels, max_len=128, scale=30.0)
    B, L = b["tgt_pen"].shape
    assert b["enc"].shape == (B, L, 3)
    assert b["dec_in"].shape == (B, L, 5)
    # dec_in row t+1 carries target row t's (dx, dy)
    np.testing.assert_allclose(b["dec_in"][:, 1:, :2], b["tgt_xy"][:, :-1])
    # each sequence has exactly one END target inside its mask
    for i in range(B):
        m = b["dec_mask"][i].astype(bool)
        pens = b["tgt_pen"][i][m]
        assert (pens == PEN_END).sum() == 1
        assert pens[-1] == PEN_END


def test_bucket_batcher_static_shapes():
    tok = GridTokenizer(resolution=16)
    batcher = BucketBatcher(
        batch_size=8, buckets=(64, 128), token_mode=True, tokenizer=tok
    )
    sketches, labels = synthetic.generate_dataset(4, 32, seed=1)
    shapes = set()
    n_batches = 0
    for batch in iterate_batches(zip(sketches, labels), batcher):
        shapes.add(batch["enc"].shape)
        assert batch["enc"].shape[0] == 8
        n_batches += 1
    assert n_batches >= 128 // 8  # everything emitted (incl. drain)
    assert all(s[1] in (64, 128) for s in shapes)


def test_shards_roundtrip(tmp_path):
    sketches, labels = synthetic.generate_dataset(4, 16, seed=0)
    names = [f"c{i}" for i in range(4)]
    write_shards(
        str(tmp_path), sketches, labels, names, shard_size=16, seed=0
    )
    ds = ShardedDataset(str(tmp_path))
    assert ds.num_classes == 4
    assert ds.scale > 0
    seen = sum(1 for _ in ds.iter_sketches("train"))
    seen += sum(1 for _ in ds.iter_sketches("valid"))
    seen += sum(1 for _ in ds.iter_sketches("test"))
    assert seen == 64
    # sketch content survives byte-exact
    sk, lb = next(ds.iter_sketches("train"))
    assert sk.shape[1] == 3 and 0 <= lb < 4


def test_shard_iteration_deterministic(tmp_path):
    sketches, labels = synthetic.generate_dataset(3, 20, seed=0)
    write_shards(str(tmp_path), sketches, labels, ["a", "b", "c"], shard_size=8)
    ds = ShardedDataset(str(tmp_path))
    run1 = [lb for _, lb in ds.iter_sketches("train", shuffle_shards=True, seed=3)]
    run2 = [lb for _, lb in ds.iter_sketches("train", shuffle_shards=True, seed=3)]
    assert run1 == run2


def test_synthetic_loader_interface():
    loader = SyntheticLoader(
        num_classes=4, sketches_per_epoch=64, batch_size=8, buckets=(64, 128)
    )
    batches = list(loader.batch_iterator("train"))
    assert len(batches) >= 8
    val = loader.get_validation_set(max_batches=2)
    assert len(val) == 2
    # cached: same batch objects returned, no re-iteration
    assert loader.get_validation_set(max_batches=2)[0] is val[0]
    # asking for more grows the cache
    assert len(loader.get_validation_set(max_batches=3)) == 3
    assert get_dataloader_by_name("synthetic") is SyntheticLoader


def test_distributed_loader_with_fitted_dictionary(tmp_path):
    """prep-data --fit-dictionary -> loader with tokenizer_kind=dictionary."""
    from sketchformer_tpu.cli import main
    from sketchformer_tpu.data.registry import get_dataloader_by_name

    in_dir = tmp_path / "qd"
    in_dir.mkdir()
    rng = np.random.default_rng(0)
    for ci, name in enumerate(["a", "b"]):
        sks = [synthetic.generate_sketch(ci, rng) for _ in range(12)]
        np.savez(in_dir / f"{name}.npz",
                 train=np.asarray(sks[:10], dtype=object),
                 valid=np.asarray(sks[10:], dtype=object))
    out_dir = str(tmp_path / "shards")
    assert main(["prep-data", "--input-dir", str(in_dir),
                 "--out-dir", out_dir, "--shard-size", "8",
                 "--fit-dictionary", "--dict-size", "32"]) == 0
    loader = get_dataloader_by_name("distributed_stroke3")(
        out_dir, tokenizer_kind="dictionary",
        dictionary_path=out_dir + "/dictionary.npz",
        batch_size=4, buckets=(64,))
    assert loader.vocab_size == 36  # 32 + specials
    batch = next(loader.batch_iterator("train"))
    assert batch["enc"].max() < 36


def test_process_sharded_iteration_disjoint(tmp_path):
    """Multi-host DP: two simulated processes read disjoint, complete shard
    subsets (SURVEY.md §2 parallel table, DP row)."""
    sketches, labels = synthetic.generate_dataset(3, 24, seed=0)
    write_shards(str(tmp_path), sketches, labels, ["a", "b", "c"],
                 shard_size=8, seed=0)
    ds = ShardedDataset(str(tmp_path))

    def keyset(pi, pc):
        return {
            sk.tobytes()
            for sk, _ in ds.iter_sketches(
                "train", shuffle_shards=True, seed=5,
                process_index=pi, process_count=pc)
        }

    full = keyset(0, 1)
    p0, p1 = keyset(0, 2), keyset(1, 2)
    assert p0 and p1
    assert p0.isdisjoint(p1)
    assert p0 | p1 == full
    import pytest

    with pytest.raises(ValueError):
        next(ds.iter_sketches("train", process_index=2, process_count=2))


def test_loader_process_sharding_wires_through(tmp_path):
    sketches, labels = synthetic.generate_dataset(2, 24, seed=1)
    write_shards(str(tmp_path), sketches, labels, ["a", "b"],
                 shard_size=8, seed=0)
    loaders = [
        get_dataloader_by_name("distributed_stroke3")(
            str(tmp_path), batch_size=4, buckets=(128,),
            process_index=pi, process_count=2)
        for pi in range(2)
    ]
    seen = [
        {b["enc"].tobytes() for b in ld.batch_iterator("train")}
        for ld in loaders
    ]
    assert seen[0].isdisjoint(seen[1])
    # eval split is NOT process-sharded: every host reads the whole split
    v0 = list(loaders[0].batch_iterator("valid"))
    v1 = list(loaders[1].batch_iterator("valid"))
    assert len(v0) == len(v1)


def test_truncation_counters():
    tok = GridTokenizer(resolution=16)
    batcher = BucketBatcher(
        batch_size=2, buckets=(16,), token_mode=True, tokenizer=tok)
    short = np.zeros((4, 3), np.float32)
    short[-1, 2] = 1.0
    long = np.zeros((40, 3), np.float32)  # 40 pts + SEP + EOS > 16
    long[-1, 2] = 1.0
    batcher.add(short, 0)
    batcher.add(long, 0)
    assert batcher.n_added == 2
    assert batcher.n_truncated == 1
    assert batcher.truncated_frac == 0.5


def test_exact_token_bucketing_never_truncates_within_range():
    """A sketch whose exact token count fits a bucket lands in that bucket
    even when >25% of its points are pen lifts (the old estimate failed)."""
    tok = GridTokenizer(resolution=16)
    batcher = BucketBatcher(
        batch_size=1, buckets=(16, 64), token_mode=True, tokenizer=tok)
    sk = np.zeros((20, 3), np.float32)
    sk[:, 0] = 1.0
    sk[::2, 2] = 1.0  # every other point lifts: 20 + 10 SEP + EOS = 31
    batch = batcher.add(sk, 0)
    assert batch is not None and batch["enc"].shape[1] == 64
    assert batcher.n_truncated == 0


def test_loader_truncation_stats_accumulate():
    loader = SyntheticLoader(
        num_classes=2, sketches_per_epoch=32, batch_size=8, buckets=(8,))
    for _ in loader.batch_iterator("train", epoch=0):
        pass
    seen1, trunc1 = loader.truncation_stats()
    assert seen1 == 32
    for _ in loader.batch_iterator("train", epoch=1):
        pass
    seen2, _ = loader.truncation_stats()
    assert seen2 == 64
    assert trunc1 > 0  # bucket 8 truncates synthetic sketches


def test_is_real_masks_repeat_padded_rows():
    """A 3-sketch final batch carries is_real with exactly 3 ones, and the
    row-weighted losses count exactly those rows (VERDICT r2 weak 5)."""
    import jax.numpy as jnp

    from sketchformer_tpu.train.loss import (
        classification_loss,
        token_reconstruction_loss,
    )

    tok = GridTokenizer(resolution=16)
    batcher = BucketBatcher(
        batch_size=8, buckets=(64,), token_mode=True, tokenizer=tok)
    sketches, labels = synthetic.generate_dataset(3, 1, seed=3)
    batches = list(iterate_batches(zip(sketches, labels), batcher))
    assert len(batches) == 1
    b = batches[0]
    assert b["is_real"].shape == (8,)
    assert b["is_real"].sum() == 3
    np.testing.assert_array_equal(b["is_real"][:3], 1.0)
    # duplicate rows cycle through the reals
    np.testing.assert_array_equal(b["enc"][3], b["enc"][0])

    # weighted loss over the padded batch == unweighted loss over the
    # 3 real rows alone (exact: identical sums and denominators)
    rng = np.random.default_rng(0)
    logits = jnp.asarray(
        rng.standard_normal((8, 64, 20)).astype(np.float32))
    tgt = jnp.asarray(b["dec_tgt"])
    w = jnp.asarray(b["is_real"])
    loss_w, acc_w = token_reconstruction_loss(logits, tgt, row_weights=w)
    loss_3, acc_3 = token_reconstruction_loss(logits[:3], tgt[:3])
    np.testing.assert_allclose(float(loss_w), float(loss_3), rtol=1e-6)
    np.testing.assert_allclose(float(acc_w), float(acc_3), rtol=1e-6)

    cl = jnp.asarray(rng.standard_normal((8, 5)).astype(np.float32))
    lab = jnp.asarray(b["label"])
    c_w, a_w = classification_loss(cl, lab, row_weights=w)
    c_3, a_3 = classification_loss(cl[:3], lab[:3])
    np.testing.assert_allclose(float(c_w), float(c_3), rtol=1e-6)
    np.testing.assert_allclose(float(a_w), float(a_3), rtol=1e-6)


@pytest.mark.slow
def test_is_real_excluded_from_embedding_galleries():
    """embed_dataset drops duplicate rows, so an SBIR query/gallery split
    over its output can never place the same sketch on both sides."""
    from sketchformer_tpu.infer.encode import embed_dataset
    from sketchformer_tpu.models import Sketchformer, SketchformerConfig
    import jax

    tok = GridTokenizer(resolution=16)
    batcher = BucketBatcher(
        batch_size=8, buckets=(64,), token_mode=True, tokenizer=tok)
    sketches, labels = synthetic.generate_dataset(5, 1, seed=4)
    batches = list(iterate_batches(zip(sketches, labels), batcher))
    cfg = SketchformerConfig(
        vocab_size=tok.vocab_size, num_classes=5, max_len=64, d_model=32,
        num_layers=1, num_heads=2, dff=32, lowerdim=16)
    model = Sketchformer(cfg)
    params = model.init(
        jax.random.PRNGKey(0), batches[0]["enc"][:2],
        batches[0]["dec_in"][:2])["params"]
    Z, L = embed_dataset(model, params, batches)
    assert Z.shape[0] == 5 and L.shape[0] == 5


def test_device_prefetch_order_and_drain():
    """device_prefetch yields every batch once, in order, device-resident,
    and depth=0 is a synchronous passthrough (data/prefetch.py)."""
    import jax
    import numpy as np
    from sketchformer_tpu.data.prefetch import device_prefetch

    host = [{"enc": np.full((2, 3), i, np.float32), "label": np.array([i])}
            for i in range(7)]
    out = list(device_prefetch(iter(host), depth=3))
    assert len(out) == 7
    for i, b in enumerate(out):
        assert isinstance(b["enc"], jax.Array)
        assert float(b["enc"][0, 0]) == i
    sync = list(device_prefetch(iter(host), depth=0))
    assert len(sync) == 7 and isinstance(sync[0]["enc"], np.ndarray)


def test_device_prefetch_stages_ahead():
    """The prefetcher pulls up to `depth` batches from the host iterator
    before the consumer asks for the second one (the overlap property)."""
    import numpy as np
    from sketchformer_tpu.data.prefetch import device_prefetch

    pulled = []

    def src():
        for i in range(5):
            pulled.append(i)
            yield {"x": np.array([i], np.float32)}

    it = device_prefetch(src(), depth=2)
    first = next(it)
    assert float(first["x"][0]) == 0
    assert len(pulled) >= 2  # staged ahead of consumption


def test_packed_wire_roundtrip_bit_exact():
    """pack_batch -> unpack_batch reconstructs the pipeline builders'
    output exactly, both modes (data/packed.py — wire format ships only
    rows/lengths/labels; the rest is derived on device)."""
    import numpy as np
    from sketchformer_tpu.data.packed import is_packed, pack_batch, unpack_batch
    from sketchformer_tpu.data.pipeline import make_batch_cont, make_batch_tok

    sketches, labels = synthetic.generate_dataset(9, 3, seed=7)
    labels = np.asarray(labels)

    tok = GridTokenizer(resolution=16)
    full = make_batch_tok(tok, sketches, labels, max_len=48)
    wire = pack_batch(full)
    assert is_packed(wire) and set(wire) == {"enc", "label"}
    back = unpack_batch(wire)
    for k in full:
        np.testing.assert_array_equal(np.asarray(back[k]), full[k], err_msg=k)

    for native in (False, True):
        full = make_batch_cont(sketches, labels, max_len=48, scale=1.0,
                               native=native)
        wire = pack_batch(full)
        assert set(wire) == {"enc", "label", "n"}
        # wire payload is ~5x smaller than the full batch
        bytes_of = lambda b: sum(np.asarray(v).nbytes for v in b.values())
        assert bytes_of(wire) * 4 < bytes_of(full)
        back = unpack_batch(wire)
        for k in full:
            np.testing.assert_array_equal(
                np.asarray(back[k]), full[k], err_msg=f"{k} native={native}")

    # is_real rides the wire untouched
    full = make_batch_tok(tok, sketches, labels, max_len=48)
    full["is_real"] = np.array([1.0] * 8 + [0.0], np.float32)
    assert "is_real" in pack_batch(full)


def test_packed_batch_trains_identically():
    """A train step fed the packed wire batch produces the same loss and
    params as the full batch (train/step.py unpacks inside jit)."""
    import jax
    import numpy as np
    from sketchformer_tpu.data.packed import pack_batch
    from sketchformer_tpu.data.pipeline import make_batch_cont
    from sketchformer_tpu.models import Sketchformer, SketchformerConfig
    from sketchformer_tpu.train.schedule import make_optimizer
    from sketchformer_tpu.train.step import create_train_state, make_train_step

    sketches, labels = synthetic.generate_dataset(8, 2, seed=3)
    full = make_batch_cont(sketches, np.asarray(labels), max_len=48,
                           scale=1.0, native=False)
    cfg = SketchformerConfig(
        vocab_size=16, num_classes=8, max_len=48, d_model=32, num_layers=1,
        num_heads=2, dff=32, lowerdim=16, use_continuous=True,
        num_mixtures=3, dropout=0.0)
    model = Sketchformer(cfg)
    tx = make_optimizer(cfg.d_model)

    def one_step(batch):
        state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
        step = make_train_step(model, tx)
        state, m = step(state, batch)
        return float(m["loss"]), state.params

    loss_full, p_full = one_step(full)
    loss_wire, p_wire = one_step(pack_batch(full))
    assert loss_full == loss_wire
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)), p_full, p_wire)
