"""Attribute encoder time at the flagship shape: which piece costs what.

Builds stripped-down 8-layer stacks at (B=2048, T, d=256, dff=512) and
times each with the marginal-scan method, so the gap between measured MFU
and peak can be assigned to attention / layernorm / everything-else —
guides the T=192 encode optimization (VERDICT r1 item 2).

Usage: python tools/ablate_encoder.py [--seq 192]
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
    ap.add_argument("--seq", type=int, default=192)
    ap.add_argument("--batch", type=int, default=2048)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from sketchformer_tpu.models import Sketchformer, SketchformerConfig

    B, T, d, dff, L = args.batch, args.seq, 256, 512, 8
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((B, T, d)), jnp.bfloat16)

    def chain(fn):
        def mk(N):
            @jax.jit
            def run(x, *ws):
                def body(carry, _):
                    s = fn(x + carry.astype(x.dtype), *ws)
                    nxt = jnp.full_like(carry, 0) + (s * 1e-30).astype(
                        carry.dtype)
                    return nxt, s
                _, out = jax.lax.scan(
                    body, jnp.zeros_like(x[:1, :1, :1]), None, length=N)
                return out.sum()
            return run
        return mk

    report = {"seq": T, "batch": B}

    # --- 1) pure FFN stack: the matmul floor --------------------------------
    w_in = jnp.asarray(rng.standard_normal((L, d, dff)) * 0.05, jnp.bfloat16)
    w_out = jnp.asarray(rng.standard_normal((L, dff, d)) * 0.05, jnp.bfloat16)
    w_qkvo = jnp.asarray(rng.standard_normal((L, 4, d, d)) * 0.05,
                         jnp.bfloat16)

    def ffn_only(x, w_in, w_out):
        for i in range(L):
            x = x + jnp.maximum(x @ w_in[i], 0) @ w_out[i]
        return x.sum()
    report["ffn_stack_ms"] = round(
        marginal_ms(chain(ffn_only), (x0, w_in, w_out)), 3)

    # --- 2) + the four d x d projections per layer (qkvo-equivalent) --------
    def ffn_proj(x, w_in, w_out, w_qkvo):
        for i in range(L):
            h = x
            for j in range(4):
                h = h @ w_qkvo[i, j]
            x = x + h
            x = x + jnp.maximum(x @ w_in[i], 0) @ w_out[i]
        return x.sum()
    report["ffn_plus_proj_ms"] = round(
        marginal_ms(chain(ffn_proj), (x0, w_in, w_out, w_qkvo)), 3)

    # --- 3) + layernorms (flax LN on bf16) ----------------------------------
    import flax.linen as nn

    class LNStack(nn.Module):
        @nn.compact
        def __call__(self, x, w_in, w_out, w_qkvo):
            for i in range(L):
                h = nn.LayerNorm(dtype=x.dtype)(x)
                for j in range(4):
                    h = h @ w_qkvo[i, j]
                x = x + h
                h = nn.LayerNorm(dtype=x.dtype)(x)
                x = x + jnp.maximum(h @ w_in[i], 0) @ w_out[i]
            return x.sum()
    ln_mod = LNStack()
    ln_params = ln_mod.init(jax.random.PRNGKey(0), x0[:8], w_in, w_out,
                            w_qkvo)

    def ln_stack(x, w_in, w_out, w_qkvo):
        return ln_mod.apply(ln_params, x, w_in, w_out, w_qkvo)
    report["ffn_proj_ln_ms"] = round(
        marginal_ms(chain(ln_stack), (x0, w_in, w_out, w_qkvo)), 3)

    # --- 4) full encoder+bottleneck (embed), heads in {2, 1} ---------------
    for heads in (2, 1):
        cfg = SketchformerConfig(
            vocab_size=10004, num_classes=345, max_len=T, d_model=d,
            num_layers=L, num_heads=heads, dff=dff, dropout=0.1,
            lowerdim=256, dtype="bfloat16", attn_impl="pallas")
        model = Sketchformer(cfg)
        ids = rng.integers(4, 10004, size=(B, T)).astype(np.int32)
        ids[:, -8:] = 0
        ids[:, -9] = 2
        enc = jnp.asarray(ids)
        dec_in = jnp.roll(enc[:8], 1, axis=1).at[:, 0].set(1)
        params = model.init(jax.random.PRNGKey(0), enc[:8], dec_in)["params"]

        def embed_loss(p, enc):
            return model.apply({"params": p}, enc,
                               method=Sketchformer.embed).sum()

        def mk(N):
            @jax.jit
            def run(params, enc):
                def body(carry, _):
                    p = jax.tree.map(
                        lambda x: x + carry.astype(x.dtype)
                        if jnp.issubdtype(x.dtype, jnp.floating) else x,
                        params)
                    s = embed_loss(p, enc)
                    return (s * 1e-30).astype(jnp.float32), s
                _, out = jax.lax.scan(body, jnp.float32(0), None, length=N)
                return out.sum()
            return run
        ms = marginal_ms(mk, (params, enc))
        report[f"embed_full_h{heads}_ms"] = round(ms, 3)
        report[f"embed_full_h{heads}_sk_per_s"] = round(B / ms * 1e3, 0)

    # rooflines at this shape (bf16 peak ~197 TFLOP/s on v5e)
    gflop_trunk = 2 * B * T * L * (4 * d * d + 2 * d * dff) / 1e9
    gflop_attn = 2 * 2 * B * T * T * d * L / 1e9
    report["trunk_gflop"] = round(gflop_trunk, 1)
    report["attn_gflop"] = round(gflop_attn, 1)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
