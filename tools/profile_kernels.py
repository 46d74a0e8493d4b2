"""Per-kernel train cost on the real chip (flagship B=512/T=96).

Times each fused stack in isolation — fwd only and fwd+bwd — plus the
chunked CE head, with value-forced loops. Locates which kernel owns the
gap between the 56 ms full step and the ~25 ms fwd+bwd roofline.

Usage: python tools/profile_kernels.py [enc dec ce]
Env overrides: SK_H (num_heads, default 2 = flagship; 8 = reference
geometry -> packed kernels), SK_B (batch, default 512).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

B, T, d, L, H, dff = 512, 96, 256, 8, 2, 512
H = int(os.environ.get("SK_H", H))
B = int(os.environ.get("SK_B", B))
V = 10004
# BENCH h8 runs qk_norm=False (SketchformerConfig default) — probe
# the same config by default; SK_QKNORM=1 probes the stability option
QKN = os.environ.get("SK_QKNORM", "0") == "1"


def timeit(f, *args, iters=20):
    out = f(*args)
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3


def setup():
    from sketchformer_tpu.models import Sketchformer, SketchformerConfig

    cfg = SketchformerConfig(
        vocab_size=V, num_classes=345, max_len=T, d_model=d,
        num_layers=L, num_heads=H, dff=dff, dropout=0.1, lowerdim=256,
        dtype="bfloat16", attn_impl="pallas", qk_norm=QKN)
    model = Sketchformer(cfg)
    rng = np.random.default_rng(0)
    ids = rng.integers(4, V, size=(8, T)).astype(np.int32)
    enc = jnp.asarray(ids)
    dec_in = jnp.roll(enc, 1, axis=1).at[:, 0].set(1)
    params = model.init(jax.random.PRNGKey(0), enc, dec_in)["params"]
    x = jnp.asarray(rng.standard_normal((B, T, d)), jnp.bfloat16)
    return cfg, model, params, x, rng


def main(which):
    from sketchformer_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()  # slow-worker links: ~100 s/program compile
    jax.config.update("jax_default_prng_impl", "rbg")
    cfg, model, params, x, rng = setup()
    drng = jax.random.PRNGKey(1)

    if "enc" in which:
        from sketchformer_tpu.ops.pallas_encoder import \
            stack_encoder_weights
        from sketchformer_tpu.ops.pallas_encoder_train import \
            fused_encoder_stack_train

        w = stack_encoder_weights(params["encoder"], num_layers=L,
                                  compute_dtype=jnp.bfloat16)

        def enc_fwd(x):
            y = fused_encoder_stack_train(
                x, None, w, num_heads=H, qk_norm=QKN, dropout_rate=0.1,
                dropout_rng=drng)
            return y.astype(jnp.float32).sum()

        def enc_gn(x):
            g = jax.grad(enc_fwd)(x)
            return (g.astype(jnp.float32) ** 2).sum()

        print(f"enc fwd      : {timeit(jax.jit(enc_fwd), x):6.2f} ms",
              flush=True)
        print(f"enc fwd+bwd  : {timeit(jax.jit(enc_gn), x):6.2f} ms",
              flush=True)

    if "dec" in which:
        from sketchformer_tpu.ops.pallas_decoder_train import (
            fused_decoder_stack_train, stack_decoder_weights)

        wd = stack_decoder_weights(params["decoder"], num_layers=L,
                                   compute_dtype=jnp.bfloat16)
        mem = jnp.asarray(np.random.default_rng(1).standard_normal(
            (B, 16, d)), jnp.bfloat16)

        def dec_fwd(x, mem):
            y = fused_decoder_stack_train(
                x, mem, None, None, wd, num_heads=H, qk_norm=QKN,
                dropout_rate=0.1, dropout_rng=drng)
            return y.astype(jnp.float32).sum()

        def dec_gn(x, mem):
            gx, gm = jax.grad(dec_fwd, argnums=(0, 1))(x, mem)
            return ((gx.astype(jnp.float32) ** 2).sum()
                    + (gm.astype(jnp.float32) ** 2).sum())

        print(f"dec fwd      : {timeit(jax.jit(dec_fwd), x, mem):6.2f} ms",
              flush=True)
        print(f"dec fwd+bwd  : {timeit(jax.jit(dec_gn), x, mem):6.2f} ms",
              flush=True)

    if "ce" in which:
        tgt = jnp.asarray(np.random.default_rng(2).integers(
            1, V, (B, T)).astype(np.int32))

        from sketchformer_tpu.models.heads import TokenHead

        head = TokenHead(V, jnp.bfloat16)
        hp = {"params": params["out_head"]}

        for impl in ("xla", "pallas"):
            def ce(x, impl=impl):
                loss, _acc = head.apply(hp, x, tgt, impl=impl,
                                        method=TokenHead.fused_ce)
                return loss

            def ce_gn(x, ce=ce):
                g = jax.grad(ce)(x)
                return (g.astype(jnp.float32) ** 2).sum()

            print(f"ce[{impl:6s}] fwd    : {timeit(jax.jit(ce), x):6.2f} ms",
                  flush=True)
            print(f"ce[{impl:6s}] fwd+bwd: {timeit(jax.jit(ce_gn), x):6.2f} ms",
                  flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or ["enc", "dec", "ce"])
