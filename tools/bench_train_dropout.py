"""A/B the train step's dropout impl on the real chip.

Usage: python tools/bench_train_dropout.py [bits|prng|off] ...
Runs the flagship B=512/T=96 train step with each requested dropout impl
and prints ms/step + sketches/s. The impl is forced via
SKETCHFORMER_DROPOUT_IMPL (read by models/transformer.py's fused gates
through ops/pallas_dropout.resolve_impl's 'auto' default only when unset).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax


def measure(impl: str) -> None:
    import jax.numpy as jnp  # noqa: F401
    from sketchformer_tpu.models import Sketchformer, SketchformerConfig
    from sketchformer_tpu.train.schedule import make_optimizer
    from sketchformer_tpu.train.step import create_train_state, \
        make_train_step
    from sketchformer_tpu.ops import pallas_dropout as pdrop

    if impl in ("bits", "prng"):
        orig = pdrop.resolve_impl
        pdrop.resolve_impl = lambda _x, _impl=impl: _impl
    cfg = SketchformerConfig(
        vocab_size=10004, num_classes=345, max_len=96, d_model=256,
        num_layers=8, num_heads=2, dff=512,
        dropout=0.0 if impl == "off" else 0.1,
        lowerdim=256, dtype="bfloat16", attn_impl="pallas")
    model = Sketchformer(cfg)
    rng = np.random.default_rng(0)
    TB = 512
    ids = rng.integers(4, cfg.vocab_size, size=(TB, 96)).astype(np.int32)
    ids[:, -8:] = 0
    ids[:, -9] = 2
    dec_in = np.roll(ids, 1, 1)
    dec_in[:, 0] = 1
    batch = {"enc": ids, "dec_in": dec_in, "dec_tgt": ids,
             "label": rng.integers(0, 345, TB).astype(np.int32)}
    tx = make_optimizer(cfg.d_model)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    step = make_train_step(model, tx)
    state, m = step(state, batch)
    float(m["loss"])
    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch)
    float(m["loss"])
    dt = time.perf_counter() - t0
    print(f"{impl:>5}: {dt / iters * 1e3:6.2f} ms/step  "
          f"{TB * iters / dt:8,.0f} sk/s", flush=True)
    if impl in ("bits", "prng"):
        pdrop.resolve_impl = orig


if __name__ == "__main__":
    jax.config.update("jax_default_prng_impl", "rbg")
    for impl in (sys.argv[1:] or ["off", "bits", "prng"]):
        measure(impl)
