"""A/B the decode grid-cell count (CACHE_VMEM_BUDGET) in one session.

The decode floor is SERIAL per-op latency, and grid cells run
sequentially on the single TensorCore — so cells multiply the serial op
chain. The 26 MB budget predates the HBM-streamed cache redesign (when
per-batch VMEM was Tmax-resident); with streaming, per-batch cost is
only the slot bytes (~0.5 MB flagship), and 26 MB quietly left the
B=64 latency case running TWO cells and B=512 running SIXTEEN.

Interleaved same-session p50s (the only timing methodology that holds
on this backend — see tools/probe_decode_parts.py):

Usage: python tools/probe_decode_cells.py [budgets_mb ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import sketchformer_tpu.ops.pallas_decode_loop as dl
import sketchformer_tpu.infer.fast_decode as fd
from sketchformer_tpu.models import Sketchformer, SketchformerConfig

B, T = 64, 192
BB = 512


def main():
    budgets = [int(a) for a in sys.argv[1:]] or [26, 56]
    cfg = SketchformerConfig(
        vocab_size=10004, num_classes=345, max_len=T, d_model=256,
        num_layers=8, num_heads=2, dff=512, dropout=0.1, lowerdim=256,
        dtype="bfloat16", attn_impl="pallas")
    model = Sketchformer(cfg)
    rng = np.random.default_rng(0)

    def tok(Bn):
        ids = rng.integers(4, cfg.vocab_size, size=(Bn, T)).astype(np.int32)
        ids[:, -8:] = 0
        ids[:, -9] = 2
        return jnp.asarray(ids)

    enc = tok(B)
    enc_b = tok(BB)
    dec_in = jnp.roll(enc, 1, axis=1).at[:, 0].set(1)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), enc[:8],
                           dec_in[:8]))["params"]
    r2 = np.random.default_rng(42)
    params = jax.tree.map(
        lambda s: jnp.asarray(r2.standard_normal(s.shape) * 0.02, s.dtype),
        shapes)

    decs = {}
    outs = {}
    for mb in budgets:
        dl.CACHE_VMEM_BUDGET = mb * 1024 * 1024
        nb = dl._nb(B, cfg.num_layers, cfg.num_heads, 256, 128, 2)
        d = fd.make_fast_token_decoder(model, max_len=T)
        outs[mb] = np.asarray(d(params, enc))
        np.asarray(d(params, enc_b))
        decs[mb] = d
        print(f"budget {mb}MB: NB={nb} ({B // nb} cells at B={B})",
              flush=True)

    def p50(d, e, n=6):
        lat = []
        for _ in range(n):
            t0 = time.perf_counter()
            np.asarray(d(params, e))
            lat.append(time.perf_counter() - t0)
        return float(np.percentile(lat, 50)) * 1e3

    for rnd in range(3):
        msg = []
        for mb, d in decs.items():
            msg.append(f"{mb}MB p50 {p50(d, enc):6.2f} ms")
        print(f"B={B}  round {rnd}: " + "   ".join(msg), flush=True)
    for rnd in range(2):
        msg = []
        for mb, d in decs.items():
            t0 = time.perf_counter()
            for _ in range(3):
                np.asarray(d(params, enc_b))
            msg.append(f"{mb}MB {3 * BB / (time.perf_counter() - t0):7.1f} sk/s")
        print(f"B={BB} round {rnd}: " + "   ".join(msg), flush=True)
    ref = outs[budgets[0]]
    for mb in budgets[1:]:
        print(f"ids identical {budgets[0]} vs {mb}:",
              bool((ref == outs[mb]).all()))


if __name__ == "__main__":
    main()
