"""Registered validation metrics (train/val_metrics.py) + interpolation CLI.

Reference parity target: core/metrics.py metric registry (SURVEY.md §2
"Metric framework") and the paper's interpolation capability (§0).
"""

import json

import jax
import numpy as np
import pytest

from sketchformer_tpu.data.registry import SyntheticLoader
from sketchformer_tpu.models import Sketchformer, SketchformerConfig
from sketchformer_tpu.train.val_metrics import (
    MetricContext,
    build_metrics,
    val_metrics,
)


@pytest.fixture(scope="module")
def tiny_ctx():
    loader = SyntheticLoader(
        num_classes=3, sketches_per_epoch=64, batch_size=8, buckets=(48,))
    cfg = SketchformerConfig(
        vocab_size=loader.vocab_size, num_classes=3, max_len=48, d_model=32,
        num_layers=1, num_heads=2, dff=64, lowerdim=16, num_queries=2,
        dropout=0.0)
    model = Sketchformer(cfg)
    batch = loader.get_validation_set(max_batches=1)[0]
    params = model.init(
        jax.random.PRNGKey(0), batch["enc"], batch["dec_in"])["params"]
    return MetricContext(model=model, params=params, loader=loader, step=0)


def test_registry_contents():
    for name in ("recon_grid", "interpolation_grid", "retrieval",
                 "embedding_stats"):
        assert name in val_metrics
    ms = build_metrics("recon_grid, retrieval")
    assert [m.kind for m in ms] == ["image", "scalar"]
    with pytest.raises(KeyError):
        build_metrics("nope")


def test_scalar_metrics(tiny_ctx):
    out = build_metrics("retrieval")[0].compute(tiny_ctx)
    assert 0.0 <= out["retrieval_top1"] <= 1.0
    assert 0.0 <= out["retrieval_mAP"] <= 1.0
    stats = build_metrics("embedding_stats")[0].compute(tiny_ctx)
    assert stats["z_norm_mean"] > 0
    assert 0.0 <= stats["z_offdiag_corr"] <= 1.0


def test_image_metrics(tiny_ctx):
    grid = build_metrics("recon_grid")[0].compute(tiny_ctx)
    assert grid.ndim == 2 and grid.shape[0] == 128  # 2 rows of 64px
    strip = build_metrics("interpolation_grid")[0].compute(tiny_ctx)
    assert strip.ndim == 2 and strip.shape == (64, 8 * 64)
    # decoders/embed jit once and are cached on the context
    assert "embed" in tiny_ctx.cache and "tok_dec_z" in tiny_ctx.cache


@pytest.mark.slow
def test_loop_runs_registered_metrics(tmp_path):
    from sketchformer_tpu.train.loop import TrainLoopConfig, run_training

    loader = SyntheticLoader(
        num_classes=3, sketches_per_epoch=64, batch_size=8, buckets=(48,))
    cfg = SketchformerConfig(
        vocab_size=loader.vocab_size, num_classes=3, max_len=48, d_model=32,
        num_layers=1, num_heads=2, dff=64, lowerdim=16, num_queries=2,
        dropout=0.0)
    run_dir = str(tmp_path / "run")
    run_training(
        Sketchformer(cfg), loader, run_dir,
        TrainLoopConfig(
            total_steps=4, eval_every=4, save_every=4, warmup_steps=2,
            log_every=2, metrics="retrieval,recon_grid", metrics_every=2),
        max_eval_batches=1)
    seen = set()
    with open(run_dir + "/metrics.jsonl") as f:
        for line in f:
            seen |= set(json.loads(line))
    assert "retrieval_top1" in seen and "retrieval_mAP" in seen
    import os

    imgs = os.listdir(run_dir + "/images")
    assert any(p.startswith("reconstruction_") for p in imgs)


@pytest.mark.slow
def test_cli_interpolate(tmp_path):
    from sketchformer_tpu.cli import main

    run_dir = str(tmp_path / "run")
    common = [
        "--loader", "synthetic", "--run-dir", run_dir,
        "--loader-arg", "num_classes=4", "--loader-arg", "batch_size=8",
        "--loader-arg", "buckets=[48]",
    ]
    assert main([
        "train", *common,
        "--hparams",
        "d_model=32,num_layers=1,num_heads=2,dff=64,lowerdim=16,"
        "num_queries=2,max_len=48,dropout=0.0",
        "--loop-arg", "total_steps=2", "--loop-arg", "eval_every=2",
        "--loop-arg", "save_every=2", "--loop-arg", "warmup_steps=10",
        "--notifier", "none",
    ]) == 0
    out = str(tmp_path / "interp.npz")
    assert main(["interpolate", "--run-dir", run_dir, "--steps", "6",
                 "--output", out]) == 0
    with np.load(out) as z:
        assert z["embeddings"].shape == (6, 16)
        assert z["offsets"].shape == (7,)
        assert z["strip"].shape == (64, 6 * 64)
