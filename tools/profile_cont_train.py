"""Ablation profile of the cont2cont (MDN) train step vs the token flagship.

Round-3 bench history: cont_train ~7-9k sk/s while the token flagship
reached 12.1k after the Pallas CE head — yet cont mode has NO vocab head
at all (MDN head is a 256->123 dense + elementwise NLL), so it should be
FASTER than token mode, not slower. This tool isolates where the cont
step spends that time.

Ladder (all B=512, T=96, flagship trunk, bf16, pallas):
  {tok,cont}_eval : forward-only eval step — is the fwd trunk the same?
  {tok,cont}_vg   : value_and_grad of the production loss, ALL grad
                    leaves forced live (sum of every leaf returned)
  {tok,cont}_opt  : vg + optimizer update + apply (params donated)
  {tok,cont}_full : the production make_train_step (adds grad_norm +
                    nonfinite guard + metrics dict)

Engine notes are dumped at the end — if the cont trunk silently fell off
the fused kernels, it shows up there.

Run: python tools/profile_cont_train.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import dataclasses
    import functools

    import jax
    import jax.numpy as jnp
    import optax

    from sketchformer_tpu.models import Sketchformer, SketchformerConfig
    from sketchformer_tpu.train import loss as losses
    from sketchformer_tpu.train.schedule import make_optimizer
    from sketchformer_tpu.train.step import (
        create_train_state, make_eval_step, make_train_step)
    from sketchformer_tpu.utils import engines

    jax.config.update("jax_default_prng_impl", "rbg")
    assert jax.default_backend() == "tpu", "profile requires the real chip"

    B, T = 512, 96
    cfg = SketchformerConfig(
        vocab_size=10004, num_classes=345, max_len=T, d_model=256,
        num_layers=8, num_heads=2, dff=512, dropout=0.1, lowerdim=256,
        dtype="bfloat16", attn_impl="pallas")
    rng = np.random.default_rng(0)

    def timeit(fn, warm=3, iters=20):
        for _ in range(warm):
            out = fn()
        float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        return (time.perf_counter() - t0) / iters * 1e3

    tx = make_optimizer(cfg.d_model)
    results = {}

    def report(name, ms):
        results[name] = ms
        print(f"{name:12s} {ms:7.2f} ms  ({B / ms * 1e3:,.0f} sk/s)")

    def build(mode):
        """Returns (model, batch, loss_for_vg) for 'tok' or 'cont'."""
        if mode == "tok":
            model = Sketchformer(cfg)
            ids = rng.integers(4, cfg.vocab_size, size=(B, T)).astype(np.int32)
            ids[:, -8:] = 0
            batch = {
                "enc": ids, "dec_in": np.roll(ids, 1, axis=1),
                "dec_tgt": ids,
                "label": rng.integers(0, 345, B).astype(np.int32),
            }

            def vg_loss(p, jb, rngk):
                out = model.apply(
                    {"params": p}, jb["enc"], jb["dec_in"],
                    dec_tgt=jb["dec_tgt"], deterministic=False,
                    rngs={"dropout": rngk},
                    method=Sketchformer.forward_tok_loss)
                l, _ = losses.tok_multitask_loss_fused(out, jb)
                return l
        else:
            cfgc = dataclasses.replace(
                cfg, use_continuous=True, num_mixtures=20)
            model = Sketchformer(cfgc)
            rows = rng.standard_normal((B, T, 5)).astype(np.float32)
            rows[..., 2:] = 0.0
            rows[..., 2] = 1.0
            mask = np.ones((B, T), np.float32)
            batch = {
                "enc": rows, "dec_in": rows,
                "tgt_xy": rows[:, :, :2].astype(np.float32),
                "tgt_pen": np.argmax(rows[:, :, 2:], axis=-1).astype(np.int32),
                "enc_mask": mask, "dec_mask": mask,
                "label": rng.integers(0, 345, B).astype(np.int32),
            }

            def vg_loss(p, jb, rngk):
                out = model.apply(
                    {"params": p}, jb["enc"], jb["dec_in"],
                    enc_mask=jb["enc_mask"], dec_key_mask=jb["dec_mask"],
                    deterministic=False, rngs={"dropout": rngk})
                l, _ = losses.cont_multitask_loss(out, jb, 20)
                return l
        return model, batch, vg_loss

    for mode in ("tok", "cont"):
        model, batch, vg_loss = build(mode)
        state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
        params0 = jax.tree.map(np.asarray, state.params)  # host copy
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        key = jax.random.PRNGKey(1)

        # -- forward-only eval step --------------------------------------
        ev = make_eval_step(model)
        report(f"{mode}_eval", timeit(lambda: ev(state.params, batch)))

        # -- vg: force EVERY grad leaf live ------------------------------
        @jax.jit
        def vg(p, rngk, _loss=vg_loss):
            loss, grads = jax.value_and_grad(
                functools.partial(_loss, jb=jb, rngk=rngk))(p)
            force = sum(g.astype(jnp.float32).sum()
                        for g in jax.tree.leaves(grads))
            return loss + 0.0 * force
        report(f"{mode}_vg", timeit(lambda: vg(state.params, key)))

        # -- vg + optimizer (donated params/opt, no guard, no metrics) ---
        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def vg_opt(p, opt, rngk, _loss=vg_loss):
            loss, grads = jax.value_and_grad(
                functools.partial(_loss, jb=jb, rngk=rngk))(p)
            updates, opt = tx.update(grads, opt, p)
            return optax.apply_updates(p, updates), opt, loss

        carry = [jax.tree.map(jnp.asarray, params0), tx.init(state.params)]

        def opt_step():
            p, o, loss = vg_opt(carry[0], carry[1], key)
            carry[0], carry[1] = p, o
            return loss
        report(f"{mode}_opt", timeit(opt_step))

        # -- production step ----------------------------------------------
        step = make_train_step(model, tx)
        st = [create_train_state(model, tx, jax.random.PRNGKey(0), batch)]

        def prod():
            st[0], m = step(st[0], batch)
            return m["loss"]
        report(f"{mode}_full", timeit(prod))
        del state, st, carry

    print("\ndeltas:")
    for mode in ("tok", "cont"):
        print(f"  {mode}: bwd+fwd-fwd {results[f'{mode}_vg'] - results[f'{mode}_eval']:+6.2f}"
              f"  opt {results[f'{mode}_opt'] - results[f'{mode}_vg']:+6.2f}"
              f"  guard+metrics {results[f'{mode}_full'] - results[f'{mode}_opt']:+6.2f}")
    print(f"  cont-vs-tok: eval {results['cont_eval'] - results['tok_eval']:+6.2f}"
          f"  vg {results['cont_vg'] - results['tok_vg']:+6.2f}"
          f"  full {results['cont_full'] - results['tok_full']:+6.2f}")

    print("\nengine notes:", sorted(engines._seen))


if __name__ == "__main__":
    main()
