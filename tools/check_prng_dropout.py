"""TPU check: in-kernel PRNG dropout == bits-mode dropout, exactly.

The 'prng' dropout impl regenerates its byte streams inside the fwd AND
bwd kernels from the hardware PRNG (ops/pallas_dropout.py). Interpret
mode stubs the PRNG to zeros, so CPU cannot pin this; on the real chip
the check is exact and complete:

  1. emit_dropout_bits regenerates the per-(layer, batch-element) streams
     (byte k of each 32-bit word -> site k)
     the kernels draw, as a plain u8 tensor;
  2. those bytes feed the BITS-mode fused train path (itself pinned to
     the composed flax path by the CPU interpret tests);
  3. PRNG-mode value and every gradient must match BITS-mode bit-for-bit
     (identical masks, identical op order -> identical floats).

Also checks the realized keep-rate against 1 - thresh/256.

Run: python tools/check_prng_dropout.py   (exits non-zero on mismatch)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def check_encoder():
    from sketchformer_tpu.ops import pallas_dropout as pdrop
    from sketchformer_tpu.ops import pallas_encoder_train as pet
    from sketchformer_tpu.ops.pallas_encoder import stack_encoder_weights
    from sketchformer_tpu.models import Sketchformer, SketchformerConfig

    B, T, L, H, d = 8, 16, 2, 2, 256
    cfg = SketchformerConfig(
        vocab_size=100, num_classes=4, max_len=T, d_model=d, num_layers=L,
        num_heads=H, dff=128, dropout=0.1, lowerdim=32, dtype="float32")
    model = Sketchformer(cfg)
    rng = np.random.default_rng(0)
    enc = jnp.asarray(rng.integers(4, 100, size=(B, T)), jnp.int32)
    dec_in = jnp.roll(enc, 1, axis=1).at[:, 0].set(1)
    params = model.init(jax.random.PRNGKey(0), enc, dec_in)["params"]
    w = stack_encoder_weights(params["encoder"], num_layers=L,
                              compute_dtype=jnp.float32)
    wlist = [w[k] for k in pet._WKEYS]

    x = jnp.asarray(rng.standard_normal((B, T, d)), jnp.float32)
    key_mask = jnp.asarray(rng.random((B, T)) > 0.2)
    bias = jnp.where(key_mask, 0.0, pet.NEG_INF).astype(
        jnp.float32)[:, None, :]
    drop_rng = jax.random.PRNGKey(7)
    seed = pdrop.seed_from_rng(drop_rng)
    thresh = int(round(0.1 * 256))

    bits = pdrop.emit_dropout_bits(seed, L, 2, B, T, d)
    keep = (np.asarray(bits).astype(np.int32) >= thresh)
    rate = keep.mean()
    expect = 1 - thresh / 256.0
    assert abs(rate - expect) < 0.01, f"keep rate {rate} vs {expect}"

    def run(drop, impl):
        def f(x, wl):
            y = pet._stack_train(x, bias, drop, L, H, d // H,
                                 (True, False, thresh, impl, False), *wl)
            return (y.astype(jnp.float32) ** 2).sum()
        val, grads = jax.value_and_grad(f, argnums=(0, 1))(x, wlist)
        return val, grads

    v_p, g_p = jax.jit(lambda: run(seed, "prng"))()
    v_b, g_b = jax.jit(lambda: run(bits, "bits"))()
    np.testing.assert_array_equal(np.asarray(v_p), np.asarray(v_b))
    for a, b in zip(jax.tree.leaves(g_p), jax.tree.leaves(g_b)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    print(f"encoder OK (keep rate {rate:.4f})")


def check_decoder():
    from sketchformer_tpu.ops import pallas_dropout as pdrop
    from sketchformer_tpu.ops import pallas_decoder_train as pdt
    from sketchformer_tpu.ops.pallas_decoder_train import (
        stack_decoder_weights)
    from sketchformer_tpu.models import Sketchformer, SketchformerConfig

    B, T, L, H, d, Mq = 8, 16, 2, 2, 256, 8
    cfg = SketchformerConfig(
        vocab_size=100, num_classes=4, max_len=T, d_model=d, num_layers=L,
        num_heads=H, dff=128, dropout=0.1, lowerdim=32, dtype="float32")
    model = Sketchformer(cfg)
    rng = np.random.default_rng(1)
    enc = jnp.asarray(rng.integers(4, 100, size=(B, T)), jnp.int32)
    dec_in = jnp.roll(enc, 1, axis=1).at[:, 0].set(1)
    params = model.init(jax.random.PRNGKey(0), enc, dec_in)["params"]
    w = stack_decoder_weights(params["decoder"], num_layers=L,
                              compute_dtype=jnp.float32)
    wlist = [w[k] for k in pdt._DWKEYS]

    x = jnp.asarray(rng.standard_normal((B, T, d)), jnp.float32)
    mem = jnp.asarray(rng.standard_normal((B, Mq, d)), jnp.float32)
    sbias, cbias = pdt._biases(None, None)
    drop_rng = jax.random.PRNGKey(9)
    seed = pdrop.seed_from_rng(drop_rng)
    thresh = int(round(0.1 * 256))
    bits = pdrop.emit_dropout_bits(seed, L, 3, B, T, d)

    def run(drop, impl):
        def f(x, mem, wl):
            y = pdt._dec_stack_train(
                x, mem, sbias, cbias, L, H, d // H,
                (False, False, False, thresh, impl, False), drop, *wl)
            return (y.astype(jnp.float32) ** 2).sum()
        val, grads = jax.value_and_grad(f, argnums=(0, 1, 2))(x, mem, wlist)
        return val, grads

    v_p, g_p = jax.jit(lambda: run(seed, "prng"))()
    v_b, g_b = jax.jit(lambda: run(bits, "bits"))()
    np.testing.assert_array_equal(np.asarray(v_p), np.asarray(v_b))
    for a, b in zip(jax.tree.leaves(g_p), jax.tree.leaves(g_b)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    print("decoder OK")


if __name__ == "__main__":
    assert jax.default_backend() == "tpu", "requires the real TPU chip"
    check_encoder()
    check_decoder()
    print("prng dropout == bits dropout: all exact")
