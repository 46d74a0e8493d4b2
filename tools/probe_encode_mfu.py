"""Decompose the 71% encode MFU stop (round-3 verdict weak 4 / item 6).

BENCH's mfu_encode divides TRUNK FLOPs (layer matmuls + attention dots
only) by the time of the FULL embed path — embedding lookup, posenc,
fused encoder stack, bottleneck, final LN. So the published 0.71 is a
lower bound on the trunk kernel's own efficiency. This probe measures,
with the same marginal-scan method bench.py uses:

  A. full fast_embed           (what mfu_encode times)
  B. fused_encoder_stack alone (the trunk kernel on a pre-embedded pane)

and re-sweeps the kernel's one remaining degree of freedom (the
activation VMEM budget -> rows/cell) around the shipped 6 MB point.
Corrected trunk MFU = trunk FLOPs / B-time; the A-B delta is the
embedding+bottleneck share that the conservative formula books as
trunk inefficiency.

Run: PYTHONPATH=/root/repo python tools/probe_encode_mfu.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

B, T, d, L, H, dff = 2048, 96, 256, 8, 2, 512
V = 10004
N1, N2 = 4, 24
PEAK = 197e12


def marginal_ms(build_chain, *args):
    totals = {}
    for N in (N1, N2):
        f = build_chain(N)
        float(np.asarray(f(*args)).ravel()[0])
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(f(*args)).ravel()[0])
            ts.append(time.perf_counter() - t0)
        totals[N] = min(ts)
    return (totals[N2] - totals[N1]) / (N2 - N1) * 1e3


def trunk_flops(T_):
    trunk = 2 * T_ * L * (4 * d * d + 2 * d * dff)
    attn = 2 * 2 * T_ * T_ * d * L
    return (trunk + attn) * B


def main():
    from sketchformer_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    from sketchformer_tpu.infer.fast_encode import fast_embed, \
        stack_encoder_weights
    from sketchformer_tpu.models import Sketchformer, SketchformerConfig
    from sketchformer_tpu.ops import pallas_encoder as pe

    cfg = SketchformerConfig(
        vocab_size=V, num_classes=345, max_len=T, d_model=d, num_layers=L,
        num_heads=H, dff=dff, dropout=0.1, lowerdim=256, dtype="bfloat16",
        attn_impl="pallas")
    model = Sketchformer(cfg)
    rng = np.random.default_rng(0)
    ids = rng.integers(4, V, size=(B, T)).astype(np.int32)
    ids[:, -8:] = 0
    ids[:, -9] = 2
    enc = jnp.asarray(ids)
    params = model.init(jax.random.PRNGKey(0), enc[:8],
                        jnp.roll(enc[:8], 1, axis=1))["params"]

    # A: full embed (bench methodology)
    def chain_embed(N):
        @jax.jit
        def f(params, enc):
            def body(c, _):
                z = fast_embed(model, params, enc + c)
                return (z[:, :1] * 1e-20).astype(enc.dtype), z.sum()
            _, zs = jax.lax.scan(body, jnp.zeros_like(enc[:, :1]), None,
                                 length=N)
            return zs.sum()
        return f

    ms_a = marginal_ms(chain_embed, params, enc)
    mfu_a = trunk_flops(T) / (ms_a * 1e-3) / PEAK
    print(f"A full embed : {ms_a:6.2f} ms/batch  "
          f"trunk-MFU(formula) {mfu_a:5.1%}", flush=True)

    # B: trunk kernel alone on a pre-embedded activation pane
    w = stack_encoder_weights(params["encoder"], num_layers=L,
                              compute_dtype=jnp.bfloat16)
    x0 = jnp.asarray(rng.standard_normal((B, T, d)), jnp.bfloat16)
    km = ids != 0

    def chain_stack(N):
        @jax.jit
        def f(x):
            def body(c, _):
                y = pe.fused_encoder_stack(c, km, w, num_heads=H,
                                           qk_norm=cfg.qk_norm)
                return (y * 1e-20 + x).astype(x.dtype), \
                    y.astype(jnp.float32).sum()
            _, ys = jax.lax.scan(body, x, None, length=N)
            return ys.sum()
        return f

    ms_b = marginal_ms(chain_stack, x0)
    mfu_b = trunk_flops(T) / (ms_b * 1e-3) / PEAK
    print(f"B trunk alone: {ms_b:6.2f} ms/batch  trunk-MFU {mfu_b:5.1%}  "
          f"(embed+bottleneck share: {ms_a - ms_b:.2f} ms = "
          f"{(ms_a - ms_b) / ms_a:5.1%} of A)", flush=True)

    # budget sweep around the shipped 6 MB point
    for mb in (4, 6, 8, 12, 16):
        pe.ACT_VMEM_BUDGET = mb * 1024 * 1024
        ms = marginal_ms(chain_stack, x0)
        print(f"  ACT_VMEM={mb:2d}MB: {ms:6.2f} ms  "
              f"trunk-MFU {trunk_flops(T) / (ms * 1e-3) / PEAK:5.1%}",
              flush=True)


if __name__ == "__main__":
    main()
