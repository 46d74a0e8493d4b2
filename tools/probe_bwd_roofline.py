"""Where does the train-step bwd MFU go? (round-4 reopened item)

The B-sweep (tools/bench_train_b1024.py) refuted the batch-size
pipelining explanation for the 42.8 ms measured vs 25.4 ms compute-bound
train step: per-sketch cost is flat in B, so the deficit is
batch-proportional work inside the fwd+bwd kernels. This probe builds the
EXACT matmul sequence of one encoder layer's backward (recompute dots +
gradient dots, same shapes/dtypes/accumulation types as
ops/pallas_encoder_train._layer_bwd_kernel) as plain XLA, times it at
B=512/T=96 — and does the same for the fwd-only sequence.

Interpretation:
- if the XLA matmul chain is ALSO ~45% of peak, the deficit is
  shape-structural (dependent sub-GF matmuls can't fill the MXU pipeline
  at these sizes) -> publish the measured ceiling;
- if XLA lands near the roofline, the Pallas kernels' extras (VPU f32
  lanes, layout moves, grid bubbles) own the gap -> keep hunting.

Run: PYTHONPATH=/root/repo python tools/probe_bwd_roofline.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

B, T, d, dff, H, L = 512, 96, 256, 512, 2, 8
M = B * T
bf = jnp.bfloat16
f32 = jnp.float32


def _mm(a, b, dims):
    return jax.lax.dot_general(a, b, dims, preferred_element_type=f32)


_NN = (((1,), (0,)), ((), ()))
_NT = (((1,), (1,)), ((), ()))
_TN = (((0,), (0,)), ((), ()))


def timeit(f, *args, iters=30):
    out = f(*args)
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3


def layer_fwd_mm(x, w):
    """Matmuls of one encoder-layer forward (no LN/softmax/dropout)."""
    HD = d
    qkv = _mm(x, w["wqkv"], _NN).astype(bf)
    q = qkv[:, :HD].reshape(B, T, H, d // H).transpose(0, 2, 1, 3)
    k = qkv[:, HD:2 * HD].reshape(B, T, H, d // H).transpose(0, 2, 1, 3)
    v = qkv[:, 2 * HD:].reshape(B, T, H, d // H).transpose(0, 2, 1, 3)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=f32).astype(bf)
    o = jnp.einsum("bhqk,bhkd->bhqd", s, v,
                   preferred_element_type=f32).astype(bf)
    o = o.transpose(0, 2, 1, 3).reshape(M, d)
    att = _mm(o, w["wo"], _NN).astype(bf)
    h1 = _mm(att, w["w1"], _NN).astype(bf)
    y = _mm(h1, w["w2"], _NN).astype(bf)
    return y


def layer_bwd_mm(x, g, w):
    """Matmuls of one layer bwd: recompute fwd dots + grad dots (same
    count/shapes as _layer_bwd_kernel; attention bwd approximated by its
    4 dots)."""
    y = layer_fwd_mm(x, w)  # recompute
    # FFN grads
    dw2 = _mm(y, g, _TN)                       # (dff-ish proxy shapes)
    df1 = _mm(g, w["w2"], _NT).astype(bf)      # (M, dff)
    dw1 = _mm(x, df1, _TN)
    dh2 = _mm(df1, w["w1"], _NT).astype(bf)    # (M, d)
    # attn out grads
    dwo = _mm(x, dh2, _TN)
    do = _mm(dh2, w["wo"], _NT).astype(bf)
    # attention bwd dots (dv, dp, dq, dk) at head shapes
    do4 = do.reshape(B, T, H, d // H).transpose(0, 2, 1, 3)
    p = jnp.ones((B, H, T, T), bf)
    dv = jnp.einsum("bhqk,bhqd->bhkd", p, do4, preferred_element_type=f32)
    dp = jnp.einsum("bhqd,bhkd->bhqk", do4, dv.astype(bf),
                    preferred_element_type=f32).astype(bf)
    dq = jnp.einsum("bhqk,bhkd->bhqd", dp, dv.astype(bf),
                    preferred_element_type=f32).astype(bf)
    dqkv = dq.transpose(0, 2, 1, 3).reshape(M, d)
    dwqkv = _mm(x, dqkv, _TN)
    dx = _mm(dqkv, w["wqkv"][:, :d], _NT)
    return (dx.sum() + dw2.sum() + dw1.sum() + dwo.sum() + dwqkv.sum())


def main():
    from sketchformer_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((M, d)), bf)
    g = jnp.asarray(rng.standard_normal((M, d)), bf)
    w = {
        "wqkv": jnp.asarray(rng.standard_normal((d, 3 * d)), bf),
        "wo": jnp.asarray(rng.standard_normal((d, d)), bf),
        "w1": jnp.asarray(rng.standard_normal((d, dff)), bf),
        "w2": jnp.asarray(rng.standard_normal((dff, d)), bf),
    }

    @jax.jit
    def fwdL(x):
        def body(c, _):
            y = layer_fwd_mm(c, w)
            return y, ()
        y, _ = jax.lax.scan(body, x, None, length=L)
        return y.astype(f32).sum()

    @jax.jit
    def bwdL(x, g):
        def body(c, _):
            s = layer_bwd_mm(c[0], c[1], w)
            # data-dependence between iterations: no hoisting
            return (c[0] + (s * 1e-30).astype(bf), c[1]), s
        (_, _), ss = jax.lax.scan(body, (x, g), None, length=L)
        return ss.sum()

    t_fwd = timeit(fwdL, x)
    t_bwd = timeit(bwdL, x, g)

    # FLOP accounting (matmuls only)
    fwd_gf = 2 * M * (d * 3 * d + d * d + d * dff + dff * d) \
        + 2 * 2 * B * H * T * T * (d // H)
    bwd_gf = fwd_gf + 2 * M * (
        d * d + d * dff + dff * d + d * d + d * d + 3 * d * d) \
        + 4 * 2 * B * H * T * T * (d // H) // 2
    peak = 197e12
    print(f"XLA fwd matmul chain  x{L}: {t_fwd:6.2f} ms  "
          f"({L * fwd_gf / t_fwd * 1e-9:5.1f} TF/s, "
          f"{L * fwd_gf / (t_fwd * 1e-3) / peak:5.1%} MFU)")
    print(f"XLA bwd matmul chain  x{L}: {t_bwd:6.2f} ms  "
          f"({L * bwd_gf / t_bwd * 1e-9:5.1f} TF/s, "
          f"{L * bwd_gf / (t_bwd * 1e-3) / peak:5.1%} MFU)")


if __name__ == "__main__":
    main()
