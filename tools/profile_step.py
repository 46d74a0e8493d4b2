"""Train/encode step time breakdown on the real chip (marginal-scan method).

Answers VERDICT round-1 items 2+3: where do the 86 ms/step of train time and
the T=192 encode time actually go?  Each probe is timed with the same honest
marginal method as bench.py: run the computation N1 vs N2 times inside an
on-device ``lax.scan`` with a data dependency between iterations, fetch a
scalar, and report (t(N2)-t(N1))/(N2-N1) — dispatch/transfer overhead and
any remote-PJRT completion weirdness cancel in the difference.

Usage:  python tools/profile_step.py [--seq 96] [--batch 512]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def marginal_ms(make_fn, args, n1=2, n2=8, reps=3):
    """Per-iteration device time of make_fn(N)(args) in ms."""
    totals = {}
    for n in (n1, n2):
        f = make_fn(n)
        float(np.asarray(f(*args)).ravel()[0])  # compile + warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(f(*args)).ravel()[0])
            ts.append(time.perf_counter() - t0)
        totals[n] = min(ts)
    return (totals[n2] - totals[n1]) / (n2 - n1) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", type=int, default=96)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--enc-batch", type=int, default=2048)
    ap.add_argument("--heads", type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from sketchformer_tpu.models import Sketchformer, SketchformerConfig
    from sketchformer_tpu.train import loss as losses
    from sketchformer_tpu.train.schedule import make_optimizer

    jax.config.update("jax_default_prng_impl", "rbg")
    SEQ, TB = args.seq, args.batch
    cfg = SketchformerConfig(
        vocab_size=10004, num_classes=345, max_len=SEQ, d_model=256,
        num_layers=8, num_heads=args.heads, dff=512, dropout=0.1,
        lowerdim=256, dtype="bfloat16", attn_impl="pallas")
    model = Sketchformer(cfg)
    rng = np.random.default_rng(0)
    ids = rng.integers(4, cfg.vocab_size, size=(TB, SEQ)).astype(np.int32)
    ids[:, -8:] = 0
    ids[:, -9] = 2
    enc = jnp.asarray(ids)
    dec_in = jnp.roll(enc, 1, axis=1).at[:, 0].set(1)
    label = jnp.asarray(rng.integers(0, 345, TB).astype(np.int32))
    batch = {"enc": enc, "dec_in": dec_in, "dec_tgt": enc, "label": label}
    params = model.init(jax.random.PRNGKey(0), enc[:8], dec_in[:8])["params"]
    tx = make_optimizer(cfg.d_model)
    opt_state = tx.init(params)
    key = jax.random.PRNGKey(1)

    report = {"seq": SEQ, "batch": TB, "heads": args.heads}

    # ---- probe helpers: chain N iterations with a data dependency -------
    def chain_scalar(fn_of_params):
        """make_fn(N): run fn N times; perturb params input each iter."""
        def mk(N):
            @jax.jit
            def run(params, *rest):
                def body(carry, _):
                    p = jax.tree.map(
                        lambda x: x + carry.astype(x.dtype)
                        if jnp.issubdtype(x.dtype, jnp.floating) else x,
                        params)
                    s = fn_of_params(p, *rest)
                    return (s * 1e-30).astype(jnp.float32), s
                _, out = jax.lax.scan(body, jnp.float32(0), None, length=N)
                return out.sum()
            return run
        return mk

    # 1) embed-only forward (the bench headline path)
    def embed_loss(p, enc):
        return model.apply({"params": p}, enc,
                           method=Sketchformer.embed).sum()
    e = jnp.asarray(np.resize(ids, (args.enc_batch, SEQ)))
    report["embed_fwd_ms"] = round(
        marginal_ms(chain_scalar(embed_loss), (params, e)), 3)

    # 2) full teacher-forced forward + loss (deterministic)
    def full_loss(p, batch):
        out = model.apply({"params": p}, batch["enc"], batch["dec_in"])
        total, _ = losses.tok_multitask_loss(out, batch)
        return total
    report["fwd_loss_ms"] = round(
        marginal_ms(chain_scalar(full_loss), (params, batch)), 3)

    # 3) forward WITHOUT the token head / CE (hidden-sum objective):
    #    isolates head+CE cost inside the fwd
    def no_head_loss(p, batch):
        out = model.apply(
            {"params": p}, batch["enc"], batch["dec_in"],
            return_hidden=True) if False else None
        # fallback: recompute encode+decoder via public methods
        z, memory, memory_mask = model.apply(
            {"params": p}, batch["enc"], method=Sketchformer.encode)
        return z.sum()
    report["encode_half_ms"] = round(
        marginal_ms(chain_scalar(no_head_loss), (params, batch)), 3)

    # 4) fwd+bwd (value_and_grad, deterministic, no optimizer)
    def grad_norm(p, batch):
        g = jax.grad(lambda q: full_loss(q, batch))(p)
        return optax.global_norm(g)
    report["fwd_bwd_ms"] = round(
        marginal_ms(chain_scalar(grad_norm), (params, batch), n1=1, n2=4), 3)

    # 5) fwd+bwd with dropout rng
    def grad_norm_dropout(p, batch, key):
        def lf(q):
            out = model.apply(
                {"params": q}, batch["enc"], batch["dec_in"],
                deterministic=False, rngs={"dropout": key})
            total, _ = losses.tok_multitask_loss(out, batch)
            return total
        return optax.global_norm(jax.grad(lf)(p))
    report["fwd_bwd_dropout_ms"] = round(
        marginal_ms(chain_scalar(grad_norm_dropout), (params, batch, key),
                    n1=1, n2=4), 3)

    # 6) optimizer-only cost (adam update on the param tree)
    def opt_only(p, batch):
        g = jax.tree.map(jnp.ones_like, p)
        updates, _ = tx.update(g, opt_state, p)
        return optax.global_norm(updates)
    report["optimizer_ms"] = round(
        marginal_ms(chain_scalar(opt_only), (params, batch)), 3)

    # 7) CE-only cost at this shape: logits materialization + log_softmax
    V = cfg.vocab_size
    W = jnp.asarray(rng.standard_normal((256, V)).astype(np.float32))
    hid = jnp.asarray(
        rng.standard_normal((TB, SEQ, 256)).astype(np.float32))

    def ce_only(w, hid, tgt):
        logits = (hid.astype(jnp.bfloat16) @ w.astype(jnp.bfloat16)
                  ).astype(jnp.float32)
        loss, _ = losses.token_reconstruction_loss(logits, tgt)
        return loss

    def ce_grad(w, hid, tgt):
        g = jax.grad(ce_only, argnums=(0, 1))(w, hid, tgt)
        return optax.global_norm(g)

    def mk_ce(N):
        @jax.jit
        def run(w, hid, tgt):
            def body(carry, _):
                s = ce_grad(w + carry, hid, tgt)
                return (s * 1e-30).astype(jnp.float32), s
            _, out = jax.lax.scan(body, jnp.float32(0), None, length=N)
            return out.sum()
        return run
    report["ce_head_fwd_bwd_ms"] = round(
        marginal_ms(mk_ce, (W, hid, batch["dec_tgt"]), n1=1, n2=4), 3)

    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
