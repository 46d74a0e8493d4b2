"""Realistic (EOS early-exit) decode latency on a TRAINED model.

Every fixed-horizon decode number (BENCH decode_p50_ms) uses random-init
weights that never emit EOS, so it is the T=192 worst case. The product
path has chunk-granularity early exit (infer/fast_decode.py while_loop);
its user-facing p50 on typical ~40-100-token sketches needs a model that
actually terminates (round-3 verdict item 4). This tool:

1. trains the flagship tok2tok config on the disk-backed synthetic
   gallery until greedy decode terminates (>95% of rows emit EOS before
   the 192 horizon) — a few thousand B=512 steps, minutes on-chip;
   trained params are cached under /tmp so bench.py reuses them;
2. measures decode p50 at B=64 over held-out val batches with early exit
   active, sweeping chunk K (early-exit granularity vs dispatch count);
3. prints the decoded-length distribution so the number is honest about
   what "typical length" meant.

Run: PYTHONPATH=/root/repo python tools/bench_decode_realistic.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PARAMS_CACHE = "/tmp/sketchformer_tpu_trained_flagship.npz"
EOS_ID = 2
DEC_T = 192
TRAIN_B = 512
DEC_B = 64


def _flagship(vocab_size, num_classes):
    from sketchformer_tpu.models import Sketchformer, SketchformerConfig

    cfg = SketchformerConfig(
        vocab_size=vocab_size, num_classes=num_classes, max_len=DEC_T,
        d_model=256, num_layers=8, num_heads=2, dff=512, dropout=0.1,
        lowerdim=256, dtype="bfloat16", attn_impl="pallas")
    return Sketchformer(cfg)


def _save_params(path, params):
    import jax

    leaves, treedef = jax.tree_util.tree_flatten_with_path(params)
    np.savez(path, **{str(p): np.asarray(v) for p, v in leaves})


def _load_params(path, template):
    import jax

    with np.load(path) as data:
        leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
        if {str(p) for p, _ in leaves} != set(data.files):
            return None
        return jax.tree_util.tree_unflatten(
            treedef, [data[str(p)] for p, _ in leaves])


def get_trained_flagship(max_steps: int = 4000, verbose: bool = True):
    """(model, params, val_batches): flagship trained to EOS-competence on
    the cached synthetic gallery; params cached across runs."""
    import jax

    from sketchformer_tpu.infer.decode import make_token_decoder
    from tools.bench_embed_pipeline import prepare_gallery
    from sketchformer_tpu.data.registry import DistributedStroke3Loader

    data_dir = prepare_gallery()
    loader = DistributedStroke3Loader(
        data_dir, batch_size=TRAIN_B, buckets=(96,), grid_resolution=100,
        seed=0, process_index=0, process_count=1)
    model = _flagship(loader.vocab_size, loader.num_classes)
    val = []
    for b in loader.batch_iterator("valid"):
        if b["enc"].shape[0] == TRAIN_B:
            val.append(b)
        if len(val) >= 4:
            break

    from sketchformer_tpu.train.schedule import make_optimizer
    from sketchformer_tpu.train.step import create_train_state, make_train_step

    tx = make_optimizer(model.config.d_model, warmup_steps=600,
                        peak_scale=2.0)
    cached = None
    if os.path.exists(PARAMS_CACHE):
        probe = create_train_state(model, tx, jax.random.PRNGKey(0), val[0])
        cached = _load_params(PARAMS_CACHE, probe.params)
    if cached is not None:
        if verbose:
            print("using cached trained params", flush=True)
        return model, cached, val

    from itertools import cycle

    from sketchformer_tpu.data.packed import pack_batch
    from sketchformer_tpu.data.prefetch import device_prefetch

    train_batches = []
    for b in loader.batch_iterator("train"):
        if b["enc"].shape[0] == TRAIN_B:
            train_batches.append(pack_batch(b))
        if len(train_batches) >= 48:
            break
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               train_batches[0])
    step = make_train_step(model, tx)
    decode_probe = make_token_decoder(model, max_len=DEC_T)
    feed = device_prefetch(cycle(train_batches), depth=2)
    t0 = time.perf_counter()
    done_steps = 0
    while done_steps < max_steps:
        for _ in range(500):
            state, m = step(state, next(feed))
        done_steps += 500
        loss = float(np.asarray(m["loss"]))
        ids = np.asarray(decode_probe(state.params, val[0]["enc"][:DEC_B]))
        term = float((ids == EOS_ID).any(axis=1).mean())
        if verbose:
            print(f"step {done_steps}: loss {loss:.3f}, "
                  f"EOS-terminated {term:.0%} "
                  f"({time.perf_counter() - t0:.0f}s)", flush=True)
        if term > 0.95:
            break
    _save_params(PARAMS_CACHE, state.params)
    return model, state.params, val


def measure(model, params, val, ks=(8, 16, 32), reps=5, verbose=True):
    """p50 decode latency per chunk K over held-out batches; returns
    {f'decode_p50_ms_realistic_K{k}': ms} plus length stats."""
    import jax

    from sketchformer_tpu.infer.decode import make_token_decoder

    out = {}
    encs = [b["enc"][:DEC_B] for b in val[:3]]
    lengths = None
    for k in ks:
        dec = make_token_decoder(model, max_len=DEC_T, steps_per_call=k)
        ids = np.asarray(dec(params, encs[0]))  # compile + warm
        lat = []
        for enc in encs:
            for _ in range(reps):
                t0 = time.perf_counter()
                ids = np.asarray(dec(params, enc))
                lat.append(time.perf_counter() - t0)
        out[f"decode_p50_ms_realistic_K{k}"] = round(
            float(np.percentile(lat, 50)) * 1e3, 2)
        if lengths is None:
            has = (ids == EOS_ID).any(axis=1)
            first = np.where(has, np.argmax(ids == EOS_ID, axis=1) + 1,
                             DEC_T)
            lengths = dict(
                terminated_frac=round(float(has.mean()), 3),
                len_mean=round(float(first.mean()), 1),
                len_p90=int(np.percentile(first, 90)))
    out.update(lengths)
    if verbose:
        for k, v in out.items():
            print(f"{k}: {v}", flush=True)
    return out


def main():
    import jax

    from sketchformer_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    jax.config.update("jax_default_prng_impl", "rbg")
    model, params, val = get_trained_flagship()
    measure(model, params, val)


if __name__ == "__main__":
    main()
