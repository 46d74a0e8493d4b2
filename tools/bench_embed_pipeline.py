"""End-to-end gallery embedding throughput (verdict r3 item 7).

The BENCH headline (158k sk/s encode) is the MARGINAL kernel cost; what
SBIR/eval users actually run is ``infer.encode.embed_dataset``: shard read
-> tokenize (C batcher) -> bucket/pad -> packed wire -> async device
staging -> fused encode -> z fetch -> is_real filter. This tool measures
that full path over a disk-backed gallery, plus the host-only pipeline in
isolation so the gap decomposes into host vs device+overlap.

Run on the chip: PYTHONPATH=/root/repo python tools/bench_embed_pipeline.py
The gallery (default 100k synthetic sketches, ~13 MB of shards) is cached
under /tmp keyed by size so repeat runs skip generation.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

GALLERY_N = 100_000
BATCH = 2048
BUCKET = 96  # matches the headline encode row (T=96, B=2048)


def prepare_gallery(n: int = GALLERY_N) -> str:
    out = f"/tmp/sketchformer_tpu_gallery_{n}"
    if os.path.exists(os.path.join(out, "meta.npz")):
        return out
    from sketchformer_tpu.data import synthetic
    from sketchformer_tpu.data.shards import write_shards

    num_classes = 64
    sketches, labels = synthetic.generate_dataset(
        num_classes, n // num_classes, seed=11)
    write_shards(out, sketches, np.asarray(labels),
                 [f"c{i}" for i in range(num_classes)],
                 splits=(0.98, 0.01, 0.01), shard_size=8192, seed=5)
    return out


def measure(verbose: bool = True) -> dict:
    """Returns {'embed_pipeline_sketches_per_sec', 'embed_host_sketches_per_sec',
    'embed_gallery_n'} — the end-to-end and host-only pipeline rates."""
    import jax

    from sketchformer_tpu.data.registry import DistributedStroke3Loader
    from sketchformer_tpu.infer.encode import embed_dataset
    from sketchformer_tpu.models import Sketchformer, SketchformerConfig

    data_dir = prepare_gallery()
    loader = DistributedStroke3Loader(
        data_dir, batch_size=BATCH, buckets=(BUCKET,), grid_resolution=100,
        seed=0, process_index=0, process_count=1)

    cfg = SketchformerConfig(
        vocab_size=loader.vocab_size, num_classes=loader.num_classes,
        max_len=BUCKET, d_model=256, num_layers=8, num_heads=2, dff=512,
        dropout=0.1, lowerdim=256, dtype="bfloat16",
        attn_impl="pallas" if jax.default_backend() == "tpu" else "xla")
    model = Sketchformer(cfg)
    rng = np.random.default_rng(0)
    enc0 = rng.integers(4, cfg.vocab_size, size=(8, BUCKET)).astype(np.int32)
    params = model.init(jax.random.PRNGKey(0), enc0,
                        np.roll(enc0, 1, axis=1))["params"]

    # --- phase A: host pipeline alone (no device) ------------------------
    t0 = time.perf_counter()
    n_host = 0
    for b in loader.batch_iterator("train"):
        n_host += b["enc"].shape[0]
    host_dt = time.perf_counter() - t0
    if verbose:
        print(f"host pipeline: {n_host:,} sketches in {host_dt:.2f}s "
              f"({n_host / host_dt:,.0f} sk/s)", flush=True)

    # --- phase B: end-to-end embed_dataset (warm compile first) ----------
    warm = list(loader.batch_iterator("valid"))[:1]
    embed_dataset(model, params, warm)  # compile the bucket shape
    t0 = time.perf_counter()
    Z, labels = embed_dataset(model, params, loader.batch_iterator("train"))
    dt = time.perf_counter() - t0
    if verbose:
        print(f"embed_dataset: {len(Z):,} embeddings in {dt:.2f}s "
              f"({len(Z) / dt:,.0f} sk/s end-to-end)  Z={Z.shape}",
              flush=True)
        print(f"device+overlap residual: {dt - host_dt:.2f}s "
              f"(host fraction {host_dt / dt:.0%})", flush=True)
    return {
        "embed_pipeline_sketches_per_sec": round(len(Z) / dt, 1),
        "embed_host_sketches_per_sec": round(n_host / host_dt, 1),
        "embed_gallery_n": int(len(Z)),
    }


def main() -> None:
    from sketchformer_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    if "--json" in sys.argv:
        # machine-readable mode (bench.py runs this tool as a fresh
        # subprocess: the remote session's bulk-RPC throughput degrades
        # stochastically per session, so a fresh session per measurement
        # is the only reliable isolation)
        import json

        print(json.dumps(measure(verbose=False)), flush=True)
    else:
        measure()


if __name__ == "__main__":
    main()
