"""Measure the chunked decode engine on the real chip.

Reports p50 latency (B=64, T=192) and B=512 throughput for the flagship
(H=2/Dh=128) and the reference head geometry (H=8/Dh=32).

Usage: python tools/bench_decode_loop.py [h2] [h8]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def run(H):
    from sketchformer_tpu.models import Sketchformer, SketchformerConfig
    from sketchformer_tpu.infer import decode as dec

    B, T = 64, 192
    cfg = SketchformerConfig(
        vocab_size=10004, num_classes=345, max_len=T, d_model=256,
        num_layers=8, num_heads=H, dff=512, dropout=0.1, lowerdim=256,
        dtype="bfloat16", attn_impl="pallas")
    model = Sketchformer(cfg)
    rng = np.random.default_rng(0)

    def tok(Bn):
        ids = rng.integers(4, cfg.vocab_size, size=(Bn, T)).astype(np.int32)
        ids[:, -8:] = 0
        ids[:, -9] = 2
        return jnp.asarray(ids)

    enc = tok(B)
    dec_in = jnp.roll(enc, 1, axis=1).at[:, 0].set(1)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), enc[:8],
                           dec_in[:8]))["params"]
    r2 = np.random.default_rng(42)
    params = jax.tree.map(
        lambda s: jnp.asarray(r2.standard_normal(s.shape) * 0.02, s.dtype),
        shapes)

    decode = dec.make_token_decoder(model, max_len=T)
    np.asarray(decode(params, enc))
    lat = []
    for _ in range(10):
        t0 = time.perf_counter()
        np.asarray(decode(params, enc))
        lat.append(time.perf_counter() - t0)
    p50 = float(np.percentile(lat, 50)) * 1e3
    print(f"H={H}: decode p50 B={B}/T={T}: {p50:.2f} ms "
          f"({p50 / T * 1e3:.0f} us/step)", flush=True)

    BB = 512
    enc_b = tok(BB)
    np.asarray(decode(params, enc_b))
    t0 = time.perf_counter()
    for _ in range(5):
        np.asarray(decode(params, enc_b))
    thr = 5 * BB / (time.perf_counter() - t0)
    print(f"H={H}: decode B={BB} throughput: {thr:,.0f} sk/s", flush=True)


if __name__ == "__main__":
    jax.config.update("jax_default_prng_impl", "rbg")
    which = sys.argv[1:] or ["h2", "h8"]
    if "h2" in which:
        run(2)
    if "h8" in which:
        run(8)
