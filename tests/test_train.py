import jax
import jax.numpy as jnp
import numpy as np

from sketchformer_tpu.data.registry import SyntheticLoader
from sketchformer_tpu.data.tokenizer import GridTokenizer
from sketchformer_tpu.models import Sketchformer, SketchformerConfig
from sketchformer_tpu.train.schedule import make_optimizer, noam_schedule
from sketchformer_tpu.train.step import create_train_state, make_eval_step, make_train_step


def test_noam_schedule_values():
    sched = noam_schedule(d_model=512, warmup_steps=4000)
    # closed-form check at known points
    for step in (1, 100, 4000, 20000):
        got = float(sched(jnp.asarray(step)))
        want = 512 ** -0.5 * min(step ** -0.5, step * 4000 ** -1.5)
        assert abs(got - want) < 1e-9
    # peak is at warmup boundary
    assert float(sched(jnp.asarray(4000))) >= float(sched(jnp.asarray(3000)))
    assert float(sched(jnp.asarray(4000))) >= float(sched(jnp.asarray(6000)))


def _tiny_loader(token_mode=True):
    tok = GridTokenizer(resolution=10)
    return SyntheticLoader(
        num_classes=4, sketches_per_epoch=256, token_mode=token_mode,
        batch_size=16, buckets=(64,), tokenizer=tok, seed=0,
    )


def _train_some(token_mode, steps=30):
    loader = _tiny_loader(token_mode)
    cfg = SketchformerConfig(
        vocab_size=loader.vocab_size, num_classes=4, max_len=64,
        d_model=32, num_layers=1, num_heads=2, dff=64, dropout=0.0,
        lowerdim=16, num_queries=2, use_continuous=token_mode is False,
        num_mixtures=4,
    )
    model = Sketchformer(cfg)
    tx = make_optimizer(cfg.d_model, warmup_steps=100, peak_scale=4.0)
    def batch_stream():
        epoch = 0
        while True:
            yield from loader.batch_iterator("train", epoch=epoch)
            epoch += 1

    it = batch_stream()
    first = next(it)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), first)
    step = make_train_step(model, tx)
    metrics_hist = []
    batches = [first] + [next(it) for _ in range(steps - 1)]
    for b in batches:
        state, metrics = step(state, b)
        metrics_hist.append({k: float(v) for k, v in metrics.items()})
    return state, metrics_hist, model, loader


def test_tok_loss_goes_down():
    _, hist, _, _ = _train_some(token_mode=True)
    first = np.mean([h["loss"] for h in hist[:5]])
    last = np.mean([h["loss"] for h in hist[-5:]])
    assert np.isfinite(first) and np.isfinite(last)
    assert last < first * 0.9, (first, last)


def test_cont_loss_goes_down():
    _, hist, _, _ = _train_some(token_mode=False)
    first = np.mean([h["loss"] for h in hist[:5]])
    last = np.mean([h["loss"] for h in hist[-5:]])
    assert np.isfinite(first) and np.isfinite(last)
    assert last < first - 0.3, (first, last)


def test_eval_step_runs_and_matches_train_metrics_keys():
    state, hist, model, loader = _train_some(token_mode=True, steps=5)
    eval_step = make_eval_step(model)
    val = loader.get_validation_set(max_batches=1)[0]
    m = eval_step(state.params, val)
    train_only = {"grad_norm", "skipped_nonfinite"}
    assert set(hist[0]) - train_only == set(m.keys() if isinstance(m, dict) else m)
    assert np.isfinite(float(m["loss"]))


def test_train_step_is_deterministic():
    """Same seed + same data => identical params after N steps."""
    s1, h1, _, _ = _train_some(token_mode=True, steps=3)
    s2, h2, _, _ = _train_some(token_mode=True, steps=3)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_grad_accumulation_matches_full_batch():
    """accum_steps=2 must equal the full-batch step when dropout is off."""
    import jax.numpy as jnp
    from sketchformer_tpu.models import Sketchformer, SketchformerConfig
    from sketchformer_tpu.data.tokenizer import GridTokenizer
    from sketchformer_tpu.data.registry import SyntheticLoader

    tok = GridTokenizer(resolution=10)
    loader = SyntheticLoader(
        num_classes=4, sketches_per_epoch=64, batch_size=16,
        buckets=(64,), tokenizer=tok, seed=0)
    cfg = SketchformerConfig(
        vocab_size=loader.vocab_size, num_classes=4, max_len=64,
        d_model=32, num_layers=1, num_heads=2, dff=64, dropout=0.0,
        lowerdim=16, num_queries=2)
    model = Sketchformer(cfg)
    tx = make_optimizer(cfg.d_model, warmup_steps=100)
    batch = next(loader.batch_iterator("train"))
    s0 = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    s0b = create_train_state(model, tx, jax.random.PRNGKey(0), batch)

    full = make_train_step(model, tx)
    accum = make_train_step(model, tx, accum_steps=2)
    s1, m1 = full(s0, batch)
    s2, m2 = accum(s0b, batch)
    # losses are means over non-pad positions; microbatch means of unequal
    # pad counts differ slightly from the full-batch mean -> loose tol
    assert abs(float(m1["loss"]) - float(m2["loss"])) < 0.05
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)


def test_remat_step_runs_and_matches():
    from sketchformer_tpu.models import Sketchformer, SketchformerConfig
    from sketchformer_tpu.data.tokenizer import GridTokenizer
    from sketchformer_tpu.data.registry import SyntheticLoader

    tok = GridTokenizer(resolution=10)
    loader = SyntheticLoader(
        num_classes=4, sketches_per_epoch=64, batch_size=8,
        buckets=(64,), tokenizer=tok, seed=0)
    cfg = SketchformerConfig(
        vocab_size=loader.vocab_size, num_classes=4, max_len=64,
        d_model=32, num_layers=1, num_heads=2, dff=64, dropout=0.0,
        lowerdim=16, num_queries=2)
    model = Sketchformer(cfg)
    tx = make_optimizer(cfg.d_model, warmup_steps=100)
    batch = next(loader.batch_iterator("train"))
    sa = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    sb = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    plain = make_train_step(model, tx)
    remat = make_train_step(model, tx, remat=True)
    sa, ma = plain(sa, batch)
    sb, mb = remat(sb, batch)
    np.testing.assert_allclose(float(ma["loss"]), float(mb["loss"]), rtol=1e-5)
    # key/bias params have mathematically zero gradient (softmax shift
    # invariance), so Adam amplifies pure roundoff there -> loose atol
    for a, b in zip(jax.tree.leaves(sa.params), jax.tree.leaves(sb.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_nonfinite_guard_rejects_bad_update():
    import jax.numpy as jnp
    from sketchformer_tpu.models import Sketchformer, SketchformerConfig

    cfg = SketchformerConfig(
        vocab_size=1, num_classes=4, max_len=16, d_model=32, num_layers=1,
        num_heads=2, dff=64, dropout=0.0, lowerdim=16, num_queries=2,
        use_continuous=True, num_mixtures=3)
    model = Sketchformer(cfg)
    rng = np.random.default_rng(0)
    batch = {
        "enc": rng.standard_normal((4, 16, 3)).astype(np.float32),
        "enc_mask": np.ones((4, 16), np.float32),
        "dec_in": rng.standard_normal((4, 16, 5)).astype(np.float32),
        "tgt_xy": rng.standard_normal((4, 16, 2)).astype(np.float32),
        "tgt_pen": rng.integers(0, 3, (4, 16)).astype(np.int32),
        "dec_mask": np.ones((4, 16), np.float32),
        "label": rng.integers(0, 4, 4).astype(np.int32),
    }
    tx = make_optimizer(cfg.d_model, warmup_steps=10)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    step = make_train_step(model, tx)
    params_before = jax.tree.map(np.asarray, state.params)

    bad = dict(batch)
    bad["enc"] = batch["enc"].copy()
    bad["enc"][0, 0, 0] = np.nan
    state, m = step(state, bad)
    assert float(m["skipped_nonfinite"]) == 1.0
    for a, b in zip(jax.tree.leaves(params_before),
                    jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(state.step) == 1  # step still advances

    # a good batch then updates normally
    state, m = step(state, batch)
    assert float(m["skipped_nonfinite"]) == 0.0
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(params_before),
                        jax.tree.leaves(state.params)))
    assert changed
