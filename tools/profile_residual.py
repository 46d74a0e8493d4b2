"""Ablate the flagship train step to locate the non-kernel residual.

docs/PERF_TRAIN.md round 2 left a ~6 ms/step "metrics/transfer/residual"
line unexplained. This probe times the full step and then strips one
component at a time (same batch, same chip, value-forced timing):

  full        — make_train_step default (prng dropout)
  no_drop     — dropout 0
  no_opt      — value_and_grad only, no optimizer/guard (params untouched)
  no_metrics  — loss-only aux (no acc/token metrics computation)
  no_embgrad  — stop_gradient on both token-embedding tables
  no_clsgrad  — w_cls=0 AND stop_gradient on the cls head input
  fwd_only    — loss value only, no backward

Usage: python tools/profile_residual.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    jax.config.update("jax_default_prng_impl", "rbg")
    import optax
    from sketchformer_tpu.models import Sketchformer, SketchformerConfig
    from sketchformer_tpu.models.sketchformer import Sketchformer as SK
    from sketchformer_tpu.train import loss as losses
    from sketchformer_tpu.train.schedule import make_optimizer
    from sketchformer_tpu.train.step import create_train_state, \
        make_train_step

    cfg = SketchformerConfig(
        vocab_size=10004, num_classes=345, max_len=96, d_model=256,
        num_layers=8, num_heads=2, dff=512, dropout=0.1,
        lowerdim=256, dtype="bfloat16", attn_impl="pallas")
    model = Sketchformer(cfg)
    rng = np.random.default_rng(0)
    TB = 512
    ids = rng.integers(4, cfg.vocab_size, size=(TB, 96)).astype(np.int32)
    ids[:, -8:] = 0
    ids[:, -9] = 2
    dec_in = np.roll(ids, 1, 1)
    dec_in[:, 0] = 1
    batch = {"enc": jnp.asarray(ids), "dec_in": jnp.asarray(dec_in),
             "dec_tgt": jnp.asarray(ids),
             "label": jnp.asarray(
                 rng.integers(0, 345, TB).astype(np.int32))}
    tx = make_optimizer(cfg.d_model)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    params0 = state.params

    def timeit(fn, *args, iters=25):
        out = fn(*args)
        float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        t0 = time.perf_counter()
        last = args
        for _ in range(iters):
            out = fn(*args)
        float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        return (time.perf_counter() - t0) / iters * 1e3

    def report(tag, ms):
        print(f"{tag:>11}: {ms:6.2f} ms/step  {TB / ms * 1e3:8,.0f} sk/s",
              flush=True)

    # full + no_drop via the real step builder (donation breaks reuse of
    # state across iters, so rebuild state each variant and loop on it)
    for tag, drop in (("full", 0.1), ("no_drop", 0.0)):
        import dataclasses
        m = Sketchformer(dataclasses.replace(cfg, dropout=drop))
        st = create_train_state(m, tx, jax.random.PRNGKey(0), batch)
        step = make_train_step(m, tx)
        st, mtr = step(st, batch)
        float(mtr["loss"])
        t0 = time.perf_counter()
        for _ in range(25):
            st, mtr = step(st, batch)
        float(mtr["loss"])
        report(tag, (time.perf_counter() - t0) / 25 * 1e3)

    def fwd_loss(p, variant):
        def f(p):
            outputs = model.apply(
                {"params": p}, enc=batch["enc"], dec_in=batch["dec_in"],
                dec_tgt=batch["dec_tgt"], deterministic=False,
                rngs={"dropout": jax.random.PRNGKey(1)},
                method=SK.forward_tok_loss)
            loss, metrics = losses.tok_multitask_loss_fused(
                outputs, batch, w_recon=1.0, w_cls=1.0)
            if variant == "no_metrics":
                return loss, {"loss": loss}
            return loss, metrics
        return f

    def grads_step(variant, transform=None):
        def fn(p):
            f = fwd_loss(p, variant)
            if transform:
                f = transform(f)
            (loss, metrics), grads = jax.value_and_grad(
                f, has_aux=True)(p)
            return loss, grads
        return jax.jit(fn)

    # no optimizer (grads only)
    report("no_opt", timeit(grads_step("full"), params0))
    report("no_metrics", timeit(grads_step("no_metrics"), params0))

    # stop embedding grads: swap the embed tables for stop_gradient'd ones
    def sg_embeds(f):
        def g(p):
            p = jax.tree_util.tree_map_with_path(
                lambda path, x: jax.lax.stop_gradient(x)
                if any(getattr(k, "key", None) in ("enc_embed", "dec_embed")
                       for k in path) else x, p)
            return f(p)
        return g

    def fn_noemb(p):
        f = sg_embeds(fwd_loss(p, "full"))
        (loss, metrics), grads = jax.value_and_grad(f, has_aux=True)(p)
        return loss, grads
    report("no_embgrad", timeit(jax.jit(fn_noemb), params0))

    # fwd only
    def fn_fwd(p):
        loss, _ = fwd_loss(p, "full")(p)
        return loss
    report("fwd_only", timeit(jax.jit(fn_fwd), params0))


if __name__ == "__main__":
    main()
