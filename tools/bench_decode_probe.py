"""Decode-step cost breakdown probe (VERDICT r2 item 4).

Measures, at B=64 / T=192 flagship geometry on the real chip:
  A. full fast decode p50 (the product path, while_loop early exit)
  B. fixed-trip scan of the bare fused_decode_step kernel (+cache DUS)
  C. B + vocab head matmul + argmax/EOS tail (the full loop body)
The B-A-C deltas locate the time: kernel vs XLA tail vs loop/exit logic.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_default_prng_impl', 'rbg')

from sketchformer_tpu.models import Sketchformer, SketchformerConfig
from sketchformer_tpu.models.sketchformer import Sketchformer as SK
from sketchformer_tpu.models.embeddings import sinusoidal_position_encoding
from sketchformer_tpu.infer import decode as dec
from sketchformer_tpu.ops.pallas_decode_stack import (
    fused_decode_step, precompute_cross_kv)
from sketchformer_tpu.ops.pallas_decoder_train import stack_decoder_weights

B, T = 64, 192
cfg = SketchformerConfig(
    vocab_size=10004, num_classes=345, max_len=T, d_model=256,
    num_layers=8, num_heads=2, dff=512, dropout=0.1, lowerdim=256,
    dtype='bfloat16', attn_impl='pallas')
model = Sketchformer(cfg)
rng = np.random.default_rng(0)
ids = rng.integers(4, cfg.vocab_size, size=(B, T)).astype(np.int32)
ids[:, -8:] = 0; ids[:, -9] = 2
enc = jnp.asarray(ids)
dec_in = jnp.roll(enc, 1, axis=1).at[:, 0].set(1)

shapes = jax.eval_shape(
    lambda: model.init(jax.random.PRNGKey(0), enc[:8], dec_in[:8]))['params']
r2 = np.random.default_rng(42)
params = jax.tree.map(
    lambda s: jnp.asarray((r2.standard_normal(s.shape) * 0.02), s.dtype),
    shapes)


def timeit(f, *a, reps=8):
    v = f(*a); np.asarray(jax.tree.leaves(v)[0])  # compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        v = f(*a)
        np.asarray(jax.tree.leaves(v)[0])
        ts.append(time.perf_counter() - t0)
    return float(np.percentile(ts, 50))


# --- A: product path ----------------------------------------------------
decode = dec.make_token_decoder(model, max_len=T)
tA = timeit(decode, params, enc)
print(f"A full fast decode p50: {tA*1e3:.2f} ms ({tA/T*1e6:.0f} us/step)",
      flush=True)

# --- shared setup for B/C: memory + caches ------------------------------
dt = cfg.compute_dtype
L, H = cfg.num_layers, cfg.num_heads
d = cfg.d_model
Dh = d // H
Tmax = T + SK.CACHE_PAD
w = stack_decoder_weights(params['decoder'], num_layers=L, compute_dtype=dt)
_, memory, _ = model.apply({'params': params}, enc,
                           method=SK.encode)
ck, cv = precompute_cross_kv(memory, w, num_heads=H, qk_norm=cfg.qk_norm)
emb = params['dec_embed']['embed']['embedding'].astype(dt)
pos_table = jnp.asarray(sinusoidal_position_encoding(cfg.max_len, d), dt)
sqrt_d = jnp.asarray(np.sqrt(d), dt)
hw = params['out_head']['proj']['kernel'].astype(dt)
hb = params['out_head']['proj']['bias'].astype(jnp.float32)
NEG_INF = -1e9


@jax.jit
def scan_kernel_only(params_unused, x0):
    kc0 = jnp.zeros((L, B * H, Tmax, Dh), dt)
    vc0 = jnp.zeros_like(kc0)

    def body(carry, t):
        kc, vc, x = carry
        h, kn, vn = fused_decode_step(
            x, kc, vc, ck, cv, w, t, num_heads=H, qk_norm=cfg.qk_norm)
        kc = jax.lax.dynamic_update_slice(kc, kn[:, :, None, :], (0, 0, t, 0))
        vc = jax.lax.dynamic_update_slice(vc, vn[:, :, None, :], (0, 0, t, 0))
        # feed h back as next x (data dependency, no head)
        return (kc, vc, h.astype(dt)), h[:, 0]

    (_, _, _), hs = jax.lax.scan(body, (kc0, vc0, x0), jnp.arange(T))
    return hs.sum()


@jax.jit
def scan_full_body(params_unused, prev0):
    kc0 = jnp.zeros((L, B * H, Tmax, Dh), dt)
    vc0 = jnp.zeros_like(kc0)
    fin0 = jnp.zeros((B,), bool)

    def body(carry, t):
        kc, vc, prev, fin = carry
        x = emb[prev] * sqrt_d + pos_table[t]
        h, kn, vn = fused_decode_step(
            x, kc, vc, ck, cv, w, t, num_heads=H, qk_norm=cfg.qk_norm)
        kc = jax.lax.dynamic_update_slice(kc, kn[:, :, None, :], (0, 0, t, 0))
        vc = jax.lax.dynamic_update_slice(vc, vn[:, :, None, :], (0, 0, t, 0))
        logits = (h @ hw).astype(jnp.float32) + hb
        logits = logits.at[:, 0].set(NEG_INF).at[:, 1].set(NEG_INF)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        nxt = jnp.where(fin, 0, nxt)
        fin = jnp.logical_or(fin, nxt == 2)
        return (kc, vc, nxt, fin), nxt

    (_, _, _, _), outs = jax.lax.scan(
        body, (kc0, vc0, prev0, fin0), jnp.arange(T))
    return outs.sum()


x0 = jnp.zeros((B, d), dt)
tB = timeit(scan_kernel_only, params, x0)
print(f"B kernel+DUS scan ({T} steps): {tB*1e3:.2f} ms "
      f"({tB/T*1e6:.0f} us/step)", flush=True)

prev0 = jnp.full((B,), 1, jnp.int32)
tC = timeit(scan_full_body, params, prev0)
print(f"C full body scan ({T} steps): {tC*1e3:.2f} ms "
      f"({tC/T*1e6:.0f} us/step)", flush=True)
print(f"head+argmax tail: {(tC-tB)/T*1e6:.0f} us/step; "
      f"while_loop/encode overhead (A-C): {(tA-tC)*1e3:.2f} ms", flush=True)
