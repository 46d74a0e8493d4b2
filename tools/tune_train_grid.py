"""Sweep fused train-kernel grid budgets + steps_per_call on the chip.

The round-3 dropout rework freed the bits-tensor VMEM; this re-tunes the
fwd/bwd batches-per-cell budgets around the new working set and measures
the steps_per_call dispatch win, flagship B=512/T=96.

Usage: python tools/tune_train_grid.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

MB = 1024 * 1024


def measure(tag, enc_fwd=None, enc_bwd=None, dec_fwd=None, dec_bwd=None,
            steps_per_call=1):
    import sketchformer_tpu.ops.pallas_encoder as pe
    import sketchformer_tpu.ops.pallas_encoder_train as pet
    import sketchformer_tpu.ops.pallas_decoder_train as pdt
    from sketchformer_tpu.models import Sketchformer, SketchformerConfig
    from sketchformer_tpu.train.schedule import make_optimizer
    from sketchformer_tpu.train.step import create_train_state, \
        make_train_step

    saved = (pe.ACT_VMEM_BUDGET, pet.BWD_ACT_VMEM_BUDGET,
             pdt.FWD_ACT_VMEM_BUDGET, pdt.BWD_ACT_VMEM_BUDGET)
    if enc_fwd:
        pe.ACT_VMEM_BUDGET = enc_fwd * MB
    if enc_bwd:
        pet.BWD_ACT_VMEM_BUDGET = enc_bwd * MB
    if dec_fwd:
        pdt.FWD_ACT_VMEM_BUDGET = dec_fwd * MB
    if dec_bwd:
        pdt.BWD_ACT_VMEM_BUDGET = dec_bwd * MB
    try:
        cfg = SketchformerConfig(
            vocab_size=10004, num_classes=345, max_len=96, d_model=256,
            num_layers=8, num_heads=2, dff=512, dropout=0.1,
            lowerdim=256, dtype="bfloat16", attn_impl="pallas")
        model = Sketchformer(cfg)
        rng = np.random.default_rng(0)
        TB = 512
        ids = rng.integers(4, cfg.vocab_size,
                           size=(TB, 96)).astype(np.int32)
        ids[:, -8:] = 0
        ids[:, -9] = 2
        dec_in = np.roll(ids, 1, 1)
        dec_in[:, 0] = 1
        one = {"enc": ids, "dec_in": dec_in, "dec_tgt": ids,
               "label": rng.integers(0, 345, TB).astype(np.int32)}
        K = steps_per_call
        batch = (one if K == 1 else
                 {k: np.broadcast_to(v, (K,) + v.shape).copy()
                  for k, v in one.items()})
        tx = make_optimizer(cfg.d_model)
        state = create_train_state(model, tx, jax.random.PRNGKey(0), one)
        step = make_train_step(model, tx, steps_per_call=K)
        state, m = step(state, batch)
        float(m["loss"])
        iters = max(1, 30 // K)
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = step(state, batch)
        float(m["loss"])
        dt = time.perf_counter() - t0
        n = TB * iters * K
        print(f"{tag:>28}: {dt / (iters * K) * 1e3:6.2f} ms/step  "
              f"{n / dt:8,.0f} sk/s", flush=True)
    finally:
        (pe.ACT_VMEM_BUDGET, pet.BWD_ACT_VMEM_BUDGET,
         pdt.FWD_ACT_VMEM_BUDGET, pdt.BWD_ACT_VMEM_BUDGET) = saved


if __name__ == "__main__":
    jax.config.update("jax_default_prng_impl", "rbg")
    measure("baseline")
    measure("enc_fwd=12MB", enc_fwd=12)
    measure("dec_fwd=12MB", dec_fwd=12)
    measure("fwd=12 both", enc_fwd=12, dec_fwd=12)
    measure("steps_per_call=8", steps_per_call=8)
