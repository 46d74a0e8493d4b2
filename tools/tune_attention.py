"""Sweep the perf knobs VERDICT round-1 flagged: attention impl, kernel VMEM
budgets, dropout PRNG impl, and batch size — honest marginal timings on the
real chip.

Usage: python tools/tune_attention.py [--quick]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def marginal_ms(make_fn, args, n1=2, n2=8, reps=3):
    totals = {}
    for n in (n1, n2):
        f = make_fn(n)
        float(np.asarray(f(*args)).ravel()[0])
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(f(*args)).ravel()[0])
            ts.append(time.perf_counter() - t0)
        totals[n] = min(ts)
    return (totals[n2] - totals[n1]) / (n2 - n1) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from sketchformer_tpu.models import Sketchformer, SketchformerConfig
    from sketchformer_tpu.ops import pallas_attention as pa
    from sketchformer_tpu.train import loss as losses

    report = {}
    rng = np.random.default_rng(0)

    def record(key, value):
        report[key] = value
        print(key, value, flush=True)
        with open("/tmp/tune_report.json", "w") as f:
            json.dump(report, f, indent=2)

    def make_model(seq, impl, heads=2):
        cfg = SketchformerConfig(
            vocab_size=10004, num_classes=345, max_len=seq, d_model=256,
            num_layers=8, num_heads=heads, dff=512, dropout=0.1,
            lowerdim=256, dtype="bfloat16", attn_impl=impl)
        return Sketchformer(cfg)

    def tok_batch(B, L):
        ids = rng.integers(4, 10004, size=(B, L)).astype(np.int32)
        ids[:, -8:] = 0
        ids[:, -9] = 2
        return jnp.asarray(ids)

    def chain_scalar(fn):
        def mk(N):
            @jax.jit
            def run(params, *rest):
                def body(carry, _):
                    p = jax.tree.map(
                        lambda x: x + carry.astype(x.dtype)
                        if jnp.issubdtype(x.dtype, jnp.floating) else x,
                        params)
                    s = fn(p, *rest)
                    return (s * 1e-30).astype(jnp.float32), s
                _, out = jax.lax.scan(body, jnp.float32(0), None, length=N)
                return out.sum()
            return run
        return mk

    # ---- encode sweep: impl x seq x fwd-budget ---------------------------
    for seq, EB in ((96, 2048), (192, 2048)):
        enc = tok_batch(EB, seq)
        for impl in ("xla", "pallas"):
            model = make_model(seq, impl)
            dec_in = jnp.roll(enc[:8], 1, axis=1).at[:, 0].set(1)
            params = model.init(
                jax.random.PRNGKey(0), enc[:8], dec_in)["params"]

            def embed_loss(p, enc):
                return model.apply({"params": p}, enc,
                                   method=Sketchformer.embed).sum()

            budgets = ([None] if impl == "xla"
                       else [1, 2, 4, 8] if not args.quick else [2, 8])
            for mb in budgets:
                if mb is not None:
                    pa.FWD_VMEM_BUDGET = mb * 1024 * 1024
                jax.clear_caches()
                key = f"embed_T{seq}_{impl}" + (
                    f"_fwd{mb}MB" if mb else "")
                try:
                    ms = marginal_ms(chain_scalar(embed_loss), (params, enc))
                except Exception as e:
                    record(key, {"error": type(e).__name__})
                    continue
                record(key, {
                    "ms": round(ms, 3),
                    "sk_per_s": round(EB / ms * 1e3, 0),
                })
    pa.FWD_VMEM_BUDGET = 2 * 1024 * 1024

    # ---- train fwd+bwd sweep: bwd budget, prng impl, batch ----------------
    def fwd_bwd_probe(model, B, seq, prng_impl):
        jax.config.update("jax_default_prng_impl", prng_impl)
        enc = tok_batch(B, seq)
        dec_in = jnp.roll(enc, 1, axis=1).at[:, 0].set(1)
        label = jnp.asarray(rng.integers(0, 345, B).astype(np.int32))
        batch = {"enc": enc, "dec_in": dec_in, "dec_tgt": enc,
                 "label": label}
        params = model.init(
            jax.random.PRNGKey(0), enc[:8], dec_in[:8])["params"]
        key = jax.random.PRNGKey(1)

        def g(p, batch, key):
            def lf(q):
                out = model.apply(
                    {"params": q}, batch["enc"], batch["dec_in"],
                    deterministic=False, rngs={"dropout": key})
                total, _ = losses.tok_multitask_loss(out, batch)
                return total
            return optax.global_norm(jax.grad(lf)(p))
        return marginal_ms(chain_scalar(g), (params, batch, key),
                           n1=1, n2=4)

    model = make_model(96, "pallas")
    for bb in ([1, 2, 4] if not args.quick else [1, 4]):
        pa.BWD_VMEM_BUDGET = bb * 1024 * 1024
        jax.clear_caches()
        try:
            ms = fwd_bwd_probe(model, 512, 96, "rbg")
        except Exception as e:
            record(f"train_B512_bwd{bb}MB_rbg", {"error": type(e).__name__})
            continue
        record(f"train_B512_bwd{bb}MB_rbg", {
            "ms": round(ms, 3), "sk_per_s": round(512 / ms * 1e3, 0)})
    pa.BWD_VMEM_BUDGET = 1024 * 1024

    for impl_name in ("unsafe_rbg",):
        jax.clear_caches()
        try:
            ms = fwd_bwd_probe(model, 512, 96, impl_name)
        except Exception as e:
            record(f"train_B512_bwd1MB_{impl_name}",
                   {"error": type(e).__name__})
            continue
        record(f"train_B512_bwd1MB_{impl_name}", {
            "ms": round(ms, 3), "sk_per_s": round(512 / ms * 1e3, 0)})

    for B in ((1024,) if not args.quick else (1024,)):
        jax.clear_caches()
        try:
            ms = fwd_bwd_probe(model, B, 96, "rbg")
        except Exception as e:
            record(f"train_B{B}_bwd1MB_rbg", {"error": type(e).__name__})
            continue
        record(f"train_B{B}_bwd1MB_rbg", {
            "ms": round(ms, 3), "sk_per_s": round(B / ms * 1e3, 0)})

    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
