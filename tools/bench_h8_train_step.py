"""Full-train-step h8 throughput probe (the BENCH sec_h8_train protocol).

Measures sketches/sec for the reference head geometry (d256 L8 H8x32)
with the CURRENT env knobs (SK_PACKED_SOFTMAX, SK_PACKED_BWD_NB,
SK_ENC_BWD_VMEM_MB, SK_DEC_BWD_VMEM_MB) — run it once per knob combo as
separate processes; the knobs are read at import time.

Usage: PYTHONPATH=/root/repo python tools/bench_h8_train_step.py [B]
"""
import os
import sys
import time
from itertools import repeat

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    SEQ = 96
    cfg = SketchformerConfig(
        vocab_size=10004, num_classes=345, max_len=SEQ,
        d_model=256, num_layers=8, num_heads=8, dff=512, dropout=0.1,
        lowerdim=256, dtype="bfloat16", attn_impl="pallas")
    model = Sketchformer(cfg)
    rng = np.random.default_rng(0)
    ids = rng.integers(4, cfg.vocab_size, size=(B, SEQ)).astype(np.int32)
    ids[:, -8:] = 0
    ids[:, -9] = 2
    dec_in = np.roll(ids, 1, axis=1)
    dec_in[:, 0] = 1
    batch = {"enc": ids, "dec_in": dec_in, "dec_tgt": ids,
             "label": rng.integers(0, 345, B).astype(np.int32)}
    tx = make_optimizer(cfg.d_model)
    st = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    stp = make_train_step(model, tx)
    feed = device_prefetch(repeat(pack_batch(batch)), depth=2)
    st, m = stp(st, next(feed))
    float(np.asarray(m["loss"]))
    n = max(20 * 512 // B, 4)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            st, m = stp(st, next(feed))
        float(np.asarray(m["loss"]))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    knobs = {k: os.environ.get(k) for k in
             ("SK_PACKED_SOFTMAX", "SK_PACKED_BWD_NB",
              "SK_ENC_BWD_VMEM_MB", "SK_DEC_BWD_VMEM_MB") if
             os.environ.get(k)}
    print(f"h8 train B={B}: {B * n / best:.1f} sk/s "
          f"({best / n * 1e3:.2f} ms/step) knobs={knobs}", flush=True)


if __name__ == "__main__":
    main()
