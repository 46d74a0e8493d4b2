"""Isolate the dropout cost seen in the train-step profile (~16 ms/step at
B=512: 43 mask sites on (B, T, 256) activations) and measure alternatives.

Variants:
- nn_dropout: flax nn.Dropout (jax.random.bernoulli -> f32 uniforms)
- u8_dropout: uint8 threshold masks — 4x fewer generated random bits; the
  keep-probability is quantized to 1/256 and the rescale uses the REALIZED
  keep rate so the expectation stays exact.
- none: no dropout (floor)

Usage: python tools/bench_dropout.py
"""

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
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_prng_impl", "rbg")
    B, T, D, SITES = 512, 96, 256, 43
    x0 = jnp.asarray(
        np.random.default_rng(0).standard_normal((B, T, D)),
        jnp.bfloat16)
    key = jax.random.PRNGKey(0)

    def nn_site(x, k):
        keep = jax.random.bernoulli(k, 0.9, x.shape)
        return jnp.where(keep, x / 0.9, 0).astype(x.dtype)

    def u8_site(x, k):
        bits = jax.random.bits(k, x.shape, dtype=jnp.uint8)
        thresh = round(0.1 * 256)                  # drop if byte < thresh
        keep_rate = 1.0 - thresh / 256.0
        return jnp.where(bits >= thresh, x / keep_rate, 0).astype(x.dtype)

    def none_site(x, k):
        return x + 1e-7

    for name, site in (("nn_dropout", nn_site), ("u8_dropout", u8_site),
                       ("none", none_site)):
        def mk(N):
            @jax.jit
            def run(x, key):
                def body(carry, i):
                    y = carry
                    for s in range(SITES):
                        y = site(y, jax.random.fold_in(key, i * SITES + s))
                    return y, y.sum()
                _, out = jax.lax.scan(
                    body, x, jnp.arange(N))
                return out.sum()
            return run
        ms = marginal_ms(mk, (x0, key))
        print(json.dumps({
            "variant": name, "ms_per_43_sites": round(ms, 3),
            "ms_per_site": round(ms / SITES, 4)}))


if __name__ == "__main__":
    main()
