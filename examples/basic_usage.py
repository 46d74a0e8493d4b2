"""Basic usage — the reference's ``basic_usage.ipynb`` as a runnable script.

Covers the same public API surface the reference notebook demonstrates:
build/restore a model, embed sketches, classify them, reconstruct them via
autoregressive decode, and interpolate between two sketch embeddings.

Run (trains a tiny model first since no pretrained checkpoint ships in this
environment; drop in a real run dir to skip):

    python examples/basic_usage.py [--run-dir out/demo] [--steps 200]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from sketchformer_tpu.data.registry import get_dataloader_by_name
from sketchformer_tpu.infer import decode as dec
from sketchformer_tpu.infer.encode import embed_dataset
from sketchformer_tpu.infer.sbir import retrieval_eval
from sketchformer_tpu.models import Sketchformer, SketchformerConfig
from sketchformer_tpu.train.loop import TrainLoopConfig, run_training
from sketchformer_tpu.utils.metrics import reconstruction_grid


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--run-dir", default="out/basic_usage")
    ap.add_argument("--steps", type=int, default=200)
    args = ap.parse_args()

    # 1. data + model ------------------------------------------------------
    loader = get_dataloader_by_name("synthetic")(
        num_classes=8, sketches_per_epoch=2048, batch_size=64, buckets=(128,))
    on_tpu = jax.default_backend() == "tpu"
    cfg = SketchformerConfig(
        vocab_size=loader.vocab_size, num_classes=8, max_len=128,
        d_model=128, num_layers=2, dff=256, lowerdim=64, dropout=0.1,
        dtype="bfloat16" if on_tpu else "float32",
        attn_impl="pallas" if on_tpu else "xla")
    model = Sketchformer(cfg)

    # 2. train briefly (or resume a previous run) --------------------------
    final = run_training(
        model, loader, args.run_dir,
        TrainLoopConfig(total_steps=args.steps, eval_every=args.steps,
                        save_every=args.steps, warmup_steps=50,
                        peak_scale=4.0))
    print("eval:", {k: round(v, 3) for k, v in final.items()})

    # reload params from the checkpoint we just wrote
    from sketchformer_tpu.train.checkpoint import CheckpointManager
    from sketchformer_tpu.train.schedule import make_optimizer
    from sketchformer_tpu.train.step import create_train_state

    ckpt = CheckpointManager(args.run_dir)
    first = loader.get_validation_set(max_batches=1)[0]
    template = create_train_state(
        model, make_optimizer(cfg.d_model), jax.random.PRNGKey(0), first)
    params = ckpt.restore(template).params  # adapts template rng via meta
    ckpt.close()

    # 3. embed + classify --------------------------------------------------
    Z, labels = embed_dataset(model, params, loader.get_validation_set(4))
    print("embeddings:", Z.shape)
    ret = retrieval_eval(Z, labels, Z, labels, exclude_self=True)
    print("retrieval:", {k: round(v, 3) for k, v in ret.items()})

    # 4. reconstruct via KV-cached AR decode ------------------------------
    ids = dec.make_token_decoder(model)(params, first["enc"])
    recon = dec.tokens_to_sketches(loader.tokenizer, np.asarray(ids))
    originals = [loader.tokenizer.decode(row) for row in np.asarray(first["enc"])]
    grid = reconstruction_grid(originals, recon)
    out = os.path.join(args.run_dir, "reconstruction_grid.npy")
    np.save(out, grid)
    print(f"reconstructions: {sum(len(s) > 0 for s in recon)}/{len(recon)} "
          f"non-empty; grid saved to {out}")

    # 5. interpolate between two embeddings -------------------------------
    za, zb = Z[0], Z[1]
    alphas = np.linspace(0, 1, 5)
    z_interp = np.stack([(1 - a) * za + a * zb for a in alphas]).astype(
        np.float32)
    ids_i = dec.make_token_decoder_from_z(model)(params, z_interp)
    interp = dec.tokens_to_sketches(loader.tokenizer, np.asarray(ids_i))
    print("interpolation lengths:", [len(s) for s in interp])


if __name__ == "__main__":
    main()
