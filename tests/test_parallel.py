"""Distributed-without-a-cluster tests (SURVEY.md §4 item 4): 8 virtual CPU
devices via --xla_force_host_platform_device_count (set in conftest)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from sketchformer_tpu.data.registry import SyntheticLoader
from sketchformer_tpu.data.tokenizer import GridTokenizer
from sketchformer_tpu.models import Sketchformer, SketchformerConfig
from sketchformer_tpu.parallel.mesh import make_mesh
from sketchformer_tpu.parallel.sharding import (
    get_param_specs,
    shard_batch,
    shard_state,
)
from sketchformer_tpu.train.schedule import make_optimizer
from sketchformer_tpu.train.step import create_train_state, make_train_step

# full-tier only: heavy kernel/equivalence coverage (pyproject two-tier note)
pytestmark = pytest.mark.slow


def _setup(mesh=None, model_kwargs=None):
    tok = GridTokenizer(resolution=10)
    loader = SyntheticLoader(
        num_classes=4, sketches_per_epoch=128, batch_size=16,
        buckets=(64,), tokenizer=tok, seed=0)
    kwargs = dict(
        vocab_size=loader.vocab_size, num_classes=4, max_len=64,
        d_model=32, num_layers=2, num_heads=4, dff=64, dropout=0.0,
        lowerdim=16, num_queries=2)
    kwargs.update(model_kwargs or {})
    cfg = SketchformerConfig(**kwargs)
    model = Sketchformer(cfg)
    tx = make_optimizer(cfg.d_model, warmup_steps=100, peak_scale=4.0)
    batches = list(loader.batch_iterator("train"))[:4]
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batches[0])
    return model, tx, state, batches


def test_mesh_shapes():
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    mesh = make_mesh()
    assert mesh.axis_names == ("data", "model")
    assert mesh.shape == {"data": 8, "model": 1}
    mesh2 = make_mesh(model_parallelism=2)
    assert mesh2.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(model_parallelism=3)


def test_param_specs_patterns():
    model, tx, state, _ = _setup()
    specs = get_param_specs(state.params)
    flat = {
        "/".join(str(k.key) for k in path): spec
        for path, spec in jax.tree_util.tree_flatten_with_path(
            specs, is_leaf=lambda x: isinstance(x, P))[0]
    }
    assert flat["encoder/layer_0/ffn/in/kernel"] == P(None, "model")
    assert flat["encoder/layer_0/ffn/out/kernel"] == P("model", None)
    assert flat["encoder/layer_0/self_attn/query/kernel"] == P(None, "model", None)
    assert flat["encoder/layer_0/self_attn/out/kernel"] == P("model", None, None)
    assert flat["enc_embed/embed/embedding"] == P(None, "model")
    # biases / layernorm scales replicated
    assert flat["encoder/layer_0/ffn/in/bias"] == P(None)


@pytest.mark.parametrize("model_parallelism", [1, 2])
def test_sharded_step_matches_single_device(model_parallelism):
    """DP(+TP) sharded training must produce the same loss trajectory as the
    unsharded step — the central correctness property of the GSPMD layer."""
    model, tx, state0, batches = _setup()
    # single-device reference
    step_ref = make_train_step(model, tx)
    s = state0
    ref_losses = []
    for b in batches:
        s, m = step_ref(s, b)
        ref_losses.append(float(m["loss"]))

    mesh = make_mesh(model_parallelism=model_parallelism)
    _, _, state1, _ = _setup()  # fresh identical state (same seed)
    sharded = shard_state(state1, mesh)
    step_sh = make_train_step(model, tx, mesh=mesh)
    sh_losses = []
    for b in batches:
        sharded, m = step_sh(sharded, shard_batch(b, mesh))
        sh_losses.append(float(m["loss"]))

    np.testing.assert_allclose(ref_losses, sh_losses, rtol=2e-4, atol=2e-5)


def test_sharded_batch_layout():
    mesh = make_mesh()
    _, _, _, batches = _setup()
    sb = shard_batch(batches[0], mesh)
    shard = sb["enc"].sharding
    assert shard.spec == P("data", None)
    # 16-row batch over 8 devices -> 2 rows per device
    assert sb["enc"].addressable_shards[0].data.shape == (2, 64)


def test_sharded_batch_layout_stacked():
    """steps_per_call batches (leading K step axis) shard the BATCH axis,
    replicating the step axis — and the device_prefetch worker places
    them the same way (stacked= flows through)."""
    import numpy as np

    from sketchformer_tpu.data.prefetch import device_prefetch

    mesh = make_mesh()
    _, _, _, batches = _setup()
    stacked = {k: np.stack([v, v]) for k, v in batches[0].items()}
    sb = shard_batch(stacked, mesh, stacked=True)
    assert sb["enc"].sharding.spec == P(None, "data", None)
    assert sb["enc"].addressable_shards[0].data.shape == (2, 2, 64)
    out = next(device_prefetch(iter([stacked]), mesh=mesh, depth=1,
                               stacked=True))
    assert out["enc"].sharding.spec == P(None, "data", None)


def test_bf16_sharded_step_runs():
    mesh = make_mesh(model_parallelism=2)
    model, tx, state, batches = _setup(model_kwargs={"dtype": "bfloat16"})
    sharded = shard_state(state, mesh)
    step = make_train_step(model, tx, mesh=mesh)
    sharded, m = step(sharded, shard_batch(batches[0], mesh))
    assert np.isfinite(float(m["loss"]))


def test_sharded_step_with_pallas_matches_single_device():
    """GSPMD + pallas custom calls: correctness must hold (XLA may insert
    gathers around the custom call; multi-chip perf would use shard_map —
    documented next-round item)."""
    model, tx, state0, batches = _setup(model_kwargs={"attn_impl": "pallas"})
    step_ref = make_train_step(model, tx)
    s = state0  # donated each step; never reuse a consumed state
    ref_losses = []
    for b in batches[:2]:
        s, m = step_ref(s, b)
        ref_losses.append(float(m["loss"]))

    mesh = make_mesh()
    _, _, state1, _ = _setup(model_kwargs={"attn_impl": "pallas"})
    sharded = shard_state(state1, mesh)
    step_sh = make_train_step(model, tx, mesh=mesh)
    got = []
    for b in batches[:2]:
        sharded, m = step_sh(sharded, shard_batch(b, mesh))
        got.append(float(m["loss"]))
    np.testing.assert_allclose(ref_losses, got, rtol=2e-4)


def test_sharded_decode_matches_single_device():
    """KV-cached AR decode under GSPMD on a ('data','model') mesh must equal
    single-device decode (VERDICT r1 item 5 — inference was mesh-untested)."""
    from sketchformer_tpu.infer import decode as dec
    from sketchformer_tpu.parallel.sharding import shard_params

    model, tx, state, batches = _setup()
    params = state.params
    enc = batches[0]["enc"]  # (16, 64)
    decode = dec.make_token_decoder(model)
    ref = np.asarray(decode(params, enc))

    mesh = make_mesh()  # data=8, model=1
    sp = shard_params(params, mesh)
    enc_sh = shard_batch({"enc": enc}, mesh)["enc"]
    got = np.asarray(decode(sp, enc_sh))
    np.testing.assert_array_equal(ref, got)


def test_sharded_decode_tp2_agrees():
    """TP=2 reorders matmul reductions, so greedy argmax may tie-flip on
    float noise; require near-total token agreement + identical shapes."""
    from sketchformer_tpu.infer import decode as dec
    from sketchformer_tpu.parallel.sharding import shard_params

    model, tx, state, batches = _setup()
    params = state.params
    enc = batches[0]["enc"]
    decode = dec.make_token_decoder(model)
    ref = np.asarray(decode(params, enc))

    mesh = make_mesh(model_parallelism=2)
    sp = shard_params(params, mesh)
    enc_sh = shard_batch({"enc": enc}, mesh)["enc"]
    got = np.asarray(decode(sp, enc_sh))
    assert got.shape == ref.shape
    agreement = (got == ref).mean()
    assert agreement > 0.98, f"token agreement {agreement:.3f}"


def test_explicit_spmd_step_matches_single_device():
    """shard_map explicit-SPMD mode (VERDICT r2 item 3): per-device grads
    + pmean must equal the single-device step. Batch rows are duplicated
    across shards so the per-shard masked means compose exactly."""
    model, tx, state0, batches = _setup(
        model_kwargs={"attn_impl": "pallas"})
    # every row identical -> shard means == global mean exactly
    b0 = {k: np.repeat(v[:1], v.shape[0], axis=0) for k, v in
          batches[0].items()}
    step_ref = make_train_step(model, tx)
    _, m_ref = step_ref(state0, b0)

    mesh = make_mesh()
    _, _, state1, _ = _setup(model_kwargs={"attn_impl": "pallas"})
    sharded = shard_state(state1, mesh)
    step_sh = make_train_step(model, tx, mesh=mesh, explicit_spmd=True)
    _, m_sh = step_sh(sharded, shard_batch(b0, mesh))
    np.testing.assert_allclose(
        float(m_ref["loss"]), float(m_sh["loss"]), rtol=2e-4)
    np.testing.assert_allclose(
        float(m_ref["grad_norm"]), float(m_sh["grad_norm"]), rtol=2e-3)


def test_explicit_spmd_heterogeneous_batch_close():
    """Heterogeneous rows: pmean-of-shard-means is the standard DP loss
    (≈ global masked mean, not bit-equal). Sanity-bound the gap."""
    model, tx, state0, batches = _setup()
    step_ref = make_train_step(model, tx)
    _, m_ref = step_ref(state0, batches[0])

    mesh = make_mesh()
    _, _, state1, _ = _setup()
    sharded = shard_state(state1, mesh)
    step_sh = make_train_step(model, tx, mesh=mesh, explicit_spmd=True)
    _, m_sh = step_sh(sharded, shard_batch(batches[0], mesh))
    ref, got = float(m_ref["loss"]), float(m_sh["loss"])
    assert abs(ref - got) / ref < 0.05, (ref, got)


def test_explicit_spmd_no_activation_allgather():
    """The shard_map path must compile WITHOUT any all-gather: activations
    stay device-local by construction, params are already replicated, and
    grads reduce via all-reduce only (the round-2 GSPMD gather risk)."""
    model, tx, state0, batches = _setup(
        model_kwargs={"attn_impl": "pallas"})
    mesh = make_mesh()
    sharded = shard_state(state0, mesh)
    step_sh = make_train_step(model, tx, mesh=mesh, explicit_spmd=True)
    b = shard_batch(batches[0], mesh)
    hlo = step_sh.lower(sharded, b).compile().as_text()
    assert "all-gather" not in hlo, "explicit-SPMD step emitted all-gather"
    assert "all-reduce" in hlo  # the grad pmean rides ICI as all-reduce
