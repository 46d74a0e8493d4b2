"""Train-step throughput vs batch size (verdict r3 weak 2 / item 5).

PERF_TRAIN.md round 3.5 closed the 42-45 ms/step vs 25.4 ms compute-bound
gap as a batch-size pipelining effect (32-64 grid cells at B=512; the same
kernels hit 71% MFU at inference B=2048). The one measurement that
substantiates or refutes that: per-sketch cost at B=1024/B=2048 must drop
toward the bound if pipelining is the cause.

Run on the chip: python tools/bench_train_b1024.py
Env: SK_H (num_heads; 8 = reference geometry -> packed kernels),
SK_BATCHES (comma list, default 512,1024,2048).
"""
import os
import time
from itertools import repeat

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from sketchformer_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    jax.config.update("jax_default_prng_impl", "rbg")

    from sketchformer_tpu.data.packed import pack_batch
    from sketchformer_tpu.data.prefetch import device_prefetch
    from sketchformer_tpu.models import Sketchformer, SketchformerConfig
    from sketchformer_tpu.train.schedule import make_optimizer
    from sketchformer_tpu.train.step import create_train_state, make_train_step

    SEQ = 96
    cfg = SketchformerConfig(
        vocab_size=10004, num_classes=345, max_len=SEQ, d_model=256,
        num_layers=8, num_heads=int(os.environ.get("SK_H", "2")),
        dff=512, dropout=0.1, lowerdim=256,
        dtype="bfloat16", attn_impl="pallas")
    model = Sketchformer(cfg)
    rng = np.random.default_rng(0)
    tx = make_optimizer(cfg.d_model)

    def tok_batch(B):
        ids = rng.integers(4, cfg.vocab_size, size=(B, SEQ)).astype(np.int32)
        ids[:, -8:] = 0
        ids[:, -9] = 2
        return ids

    batches = tuple(int(b) for b in os.environ.get(
        "SK_BATCHES", "512,1024,2048").split(","))
    for TB in batches:
        enc = tok_batch(TB)
        batch = {
            "enc": enc,
            "dec_in": np.roll(enc, 1, axis=1),
            "dec_tgt": enc,
            "label": rng.integers(0, 345, TB).astype(np.int32),
        }
        batch["dec_in"][:, 0] = 1
        st = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
        stp = make_train_step(model, tx)
        feed = device_prefetch(repeat(pack_batch(batch)), depth=2)
        st, m = stp(st, next(feed))
        float(np.asarray(m["loss"]))
        iters = max(8, 10240 // TB)
        t0 = time.perf_counter()
        for _ in range(iters):
            st, m = stp(st, next(feed))
        float(np.asarray(m["loss"]))
        dt = time.perf_counter() - t0
        print(f"B={TB}: {TB*iters/dt:,.0f} sk/s  {dt/iters*1e3:.2f} ms/step  "
              f"{dt/iters*1e6/TB:.2f} us/sketch", flush=True)


if __name__ == "__main__":
    main()
