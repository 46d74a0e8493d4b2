import time, sys, numpy as np, jax, jax.numpy as jnp
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
jax.config.update('jax_default_prng_impl', 'rbg')
from sketchformer_tpu.models import Sketchformer, SketchformerConfig
from sketchformer_tpu.infer.fast_encode import fast_embed
def _value(x): return float(np.asarray(x).ravel()[0])

def host_init(model, enc, dec_in):
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), enc[:8], dec_in[:8]))['params']
    rng = np.random.default_rng(42)
    def mk(s):
        a = (rng.standard_normal(s.shape) * 0.02).astype(np.float32)
        return jnp.asarray(a, s.dtype)
    return jax.tree.map(mk, shapes)

H = int(sys.argv[1]); T = int(sys.argv[2]); B = 2048
cfg = SketchformerConfig(vocab_size=10004, num_classes=345, max_len=T,
    d_model=256, num_layers=8, num_heads=H, dff=512, dropout=0.1,
    lowerdim=256, dtype='bfloat16', attn_impl='pallas')
model = Sketchformer(cfg)
rng = np.random.default_rng(0)
ids = rng.integers(4, cfg.vocab_size, size=(B, T)).astype(np.int32)
ids[:, -8:] = 0; ids[:, -9] = 2
enc = jnp.asarray(ids)
dec_in = jnp.roll(enc, 1, axis=1).at[:, 0].set(1)
t0 = time.perf_counter()
params = host_init(model, enc, dec_in)
print('init', time.perf_counter()-t0, flush=True)
def chained(N):
    @jax.jit
    def f(params, enc):
        def body(c, _):
            z = fast_embed(model, params, enc + c)
            return (z[:, :1]*1e-20).astype(enc.dtype), z.sum()
        _, zs = jax.lax.scan(body, jnp.zeros_like(enc[:, :1]), None, length=N)
        return zs.sum()
    return f
totals = {}
for N in (4, 24):
    f = chained(N)
    t0 = time.perf_counter(); _value(f(params, enc))
    print('compile N=%d' % N, time.perf_counter()-t0, flush=True)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); _value(f(params, enc)); ts.append(time.perf_counter()-t0)
    totals[N] = min(ts)
per = (totals[24]-totals[4])/20
print(f'H={H} T={T}: {B/per:,.0f} sk/s  ({per*1e3:.3f} ms/batch)', flush=True)
