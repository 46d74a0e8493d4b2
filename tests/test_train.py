import pytest
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


@pytest.mark.slow
def test_eval_step_runs_and_matches_train_metrics_keys():
    state, hist, model, loader = _train_some(token_mode=True, steps=5)
    eval_step = make_eval_step(model)
    val = loader.get_validation_set(max_batches=1)[0]
    m = eval_step(state.params, val)
    train_only = {"grad_norm", "skipped_nonfinite"}
    assert set(hist[0]) - train_only == set(m.keys() if isinstance(m, dict) else m)
    assert np.isfinite(float(m["loss"]))


@pytest.mark.slow
def test_train_step_is_deterministic():
    """Same seed + same data => identical params after N steps."""
    s1, h1, _, _ = _train_some(token_mode=True, steps=3)
    s2, h2, _, _ = _train_some(token_mode=True, steps=3)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
def test_steps_per_call_chunk_equals_single_steps():
    """K chunked steps == K sequential single steps (dropout off)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from sketchformer_tpu.models import Sketchformer, SketchformerConfig
    from sketchformer_tpu.train.schedule import make_optimizer
    from sketchformer_tpu.train.step import create_train_state, make_train_step

    cfg = SketchformerConfig(
        vocab_size=64, num_classes=5, max_len=24,
        d_model=32, num_layers=1, num_heads=2, dff=64, dropout=0.0,
        lowerdim=16, num_queries=2, dtype="float32")
    model = Sketchformer(cfg)
    rng = np.random.default_rng(0)
    K, B = 3, 8
    ids = rng.integers(4, 64, size=(K, B, 24)).astype(np.int32)
    ids[..., -4:] = 0
    stacked = {
        "enc": jnp.asarray(ids),
        "dec_in": jnp.roll(jnp.asarray(ids), 1, axis=-1).at[..., 0].set(1),
        "dec_tgt": jnp.asarray(ids),
        "label": jnp.asarray(rng.integers(0, 5, (K, B)).astype(np.int32)),
    }
    first = {k: v[0] for k, v in stacked.items()}
    tx = make_optimizer(cfg.d_model)

    s_single = create_train_state(model, tx, jax.random.PRNGKey(0), first)
    s_chunk = create_train_state(model, tx, jax.random.PRNGKey(0), first)
    step1 = make_train_step(model, tx)
    stepK = make_train_step(model, tx, steps_per_call=K)

    metrics_each = []
    for i in range(K):
        s_single, m = step1(s_single, {k: v[i] for k, v in stacked.items()})
        metrics_each.append(float(m["loss"]))
    s_chunk, mK = stepK(s_chunk, stacked)

    assert int(s_chunk.step) == int(s_single.step) == K
    np.testing.assert_allclose(
        float(mK["loss"]), np.mean(metrics_each), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s_single.params),
                    jax.tree.leaves(s_chunk.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-6)


@pytest.mark.slow
def test_fused_ce_matches_plain():
    """forward_tok_loss (chunked in-model CE) == __call__ + plain CE:
    loss, acc, and all parameter gradients."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from sketchformer_tpu.models import Sketchformer, SketchformerConfig
    from sketchformer_tpu.train import loss as losses

    cfg = SketchformerConfig(
        vocab_size=50, num_classes=5, max_len=24, d_model=32,
        num_layers=1, num_heads=2, dff=64, dropout=0.0,
        lowerdim=16, num_queries=2, dtype="float32")
    model = Sketchformer(cfg)
    rng = np.random.default_rng(3)
    B = 6
    ids = rng.integers(4, 50, size=(B, 24)).astype(np.int32)
    ids[:, -4:] = 0
    batch = {
        "enc": jnp.asarray(ids),
        "dec_in": jnp.roll(jnp.asarray(ids), 1, axis=1).at[:, 0].set(1),
        "dec_tgt": jnp.asarray(ids),
        "label": jnp.asarray(rng.integers(0, 5, B).astype(np.int32)),
    }
    params = model.init(jax.random.PRNGKey(0), batch["enc"],
                        batch["dec_in"])["params"]

    def loss_plain(p):
        out = model.apply({"params": p}, batch["enc"], batch["dec_in"])
        return losses.tok_multitask_loss(out, batch)

    def loss_fused(p):
        out = model.apply(
            {"params": p}, batch["enc"], batch["dec_in"],
            dec_tgt=batch["dec_tgt"],
            method=Sketchformer.forward_tok_loss)
        return losses.tok_multitask_loss_fused(out, batch)

    (ref_v, ref_m), ref_g = jax.value_and_grad(
        loss_plain, has_aux=True)(params)
    (got_v, got_m), got_g = jax.value_and_grad(
        loss_fused, has_aux=True)(params)

    np.testing.assert_allclose(float(got_v), float(ref_v), rtol=1e-6)
    np.testing.assert_allclose(float(got_m["recon_acc"]),
                               float(ref_m["recon_acc"]), rtol=1e-6)
    got_map = {jax.tree_util.keystr(k): v for k, v in
               jax.tree_util.tree_leaves_with_path(got_g)}
    for path, leaf in jax.tree_util.tree_leaves_with_path(ref_g):
        key = jax.tree_util.keystr(path)
        np.testing.assert_allclose(
            np.asarray(got_map[key]), np.asarray(leaf),
            rtol=1e-5, atol=1e-6, err_msg=key)
