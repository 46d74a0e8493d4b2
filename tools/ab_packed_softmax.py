"""In-process A/B of the packed-train softmax strategies on the chip.

Times the fused encoder/decoder train stacks (fwd+bwd, the regime the
softmax/ds choice affects) at H=8 for each SK_PACKED_SOFTMAX variant
back-to-back in ONE process, so numbers are comparable within-session
(worker speed drifts across sessions; see docs/PERF_TRAIN.md round 4).
The variant global is monkeypatched between fresh jits — it is read at
trace time, so each jit picks up the patched value.

Usage: python tools/ab_packed_softmax.py [enc dec] [variants...]
Env: SK_B (default 512), SK_ITERS (default 20).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

B, T, d, L, H, dff = 512, 96, 256, 8, 8, 512
B = int(os.environ.get("SK_B", B))
ITERS = int(os.environ.get("SK_ITERS", 20))
V = 10004
# BENCH h8 runs qk_norm=False (SketchformerConfig default) — probe
# the same config by default; SK_QKNORM=1 probes the stability option
QKN = os.environ.get("SK_QKNORM", "0") == "1"


def timeit(f, *args, iters=ITERS):
    out = f(*args)
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main(argv):
    which = [a for a in argv if a in ("enc", "dec")] or ["enc", "dec"]
    # softmax strategies plus timing-only component ablations
    # (abl:softmax / abl:qknorm / abl:blockdiag / abl:all — values wrong,
    # ladder probes for docs/PERF_TRAIN.md round 4)
    known = ("chunk", "seg4d", "mxu", "fused", "fused2", "ablate",
             "abl:softmax", "abl:qknorm", "abl:blockdiag", "abl:all")
    variants = [a for a in argv if a in known] or ["chunk", "seg4d", "mxu", "fused", "fused2"]

    from sketchformer_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    jax.config.update("jax_default_prng_impl", "rbg")

    from sketchformer_tpu.models import Sketchformer, SketchformerConfig
    from sketchformer_tpu.ops import pallas_packed as pk

    cfg = SketchformerConfig(
        vocab_size=V, num_classes=345, max_len=T, d_model=d,
        num_layers=L, num_heads=H, dff=dff, dropout=0.1, lowerdim=256,
        dtype="bfloat16", attn_impl="pallas", qk_norm=QKN)
    model = Sketchformer(cfg)
    rng = np.random.default_rng(0)
    ids = rng.integers(4, V, size=(8, T)).astype(np.int32)
    enc_ids = jnp.asarray(ids)
    dec_in = jnp.roll(enc_ids, 1, axis=1).at[:, 0].set(1)
    params = model.init(jax.random.PRNGKey(0), enc_ids, dec_in)["params"]
    x = jnp.asarray(rng.standard_normal((B, T, d)), jnp.bfloat16)
    drng = jax.random.PRNGKey(1)

    from sketchformer_tpu.ops.pallas_encoder import stack_encoder_weights
    from sketchformer_tpu.ops.pallas_encoder_train import \
        fused_encoder_stack_train
    from sketchformer_tpu.ops.pallas_decoder_train import (
        fused_decoder_stack_train, stack_decoder_weights)

    w = stack_encoder_weights(params["encoder"], num_layers=L,
                              compute_dtype=jnp.bfloat16)
    wd = stack_decoder_weights(params["decoder"], num_layers=L,
                               compute_dtype=jnp.bfloat16)
    mem = jnp.asarray(np.random.default_rng(1).standard_normal(
        (B, 16, d)), jnp.bfloat16)

    for variant in variants:
        if variant.startswith("abl:"):
            what = variant.split(":", 1)[1]
            pk._TRAIN_SOFTMAX = ("ablate" if what in ("softmax", "all")
                                 else "seg4d")
            pk._ABLATE = (frozenset() if what == "softmax"
                          else frozenset(("qknorm", "blockdiag"))
                          if what == "all" else frozenset((what,)))
        else:
            pk._TRAIN_SOFTMAX = variant
            pk._ABLATE = frozenset()

        if "enc" in which:
            def enc_fwd(x):
                y = fused_encoder_stack_train(
                    x, None, w, num_heads=H, qk_norm=QKN,
                    dropout_rate=0.1, dropout_rng=drng)
                return y.astype(jnp.float32).sum()

            def enc_gn(x):
                g = jax.grad(enc_fwd)(x)
                return (g.astype(jnp.float32) ** 2).sum()

            ms = timeit(jax.jit(enc_gn), x)
            print(f"[{variant:6s}] enc fwd+bwd: {ms:6.2f} ms", flush=True)

        if "dec" in which:
            def dec_fwd(x, mem):
                y = fused_decoder_stack_train(
                    x, mem, None, None, wd, num_heads=H, qk_norm=QKN,
                    dropout_rate=0.1, dropout_rng=drng)
                return y.astype(jnp.float32).sum()

            def dec_gn(x, mem):
                gx, gm = jax.grad(dec_fwd, argnums=(0, 1))(x, mem)
                return ((gx.astype(jnp.float32) ** 2).sum()
                        + (gm.astype(jnp.float32) ** 2).sum())

            ms = timeit(jax.jit(dec_gn), x, mem)
            print(f"[{variant:6s}] dec fwd+bwd: {ms:6.2f} ms", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
