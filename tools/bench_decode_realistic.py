"""Realistic (EOS early-exit) decode latency on a TRAINED model.

Every fixed-horizon decode number (BENCH decode_p50_ms) uses random-init
weights that never emit EOS, so it is the T=192 worst case. The product
path has chunk-granularity early exit (infer/fast_decode.py while_loop);
its user-facing p50 on typical ~40-100-token sketches needs a model that
actually terminates (round-3 verdict item 4). This tool:

1. trains the flagship tok2tok config on the disk-backed synthetic
   gallery with a FIXED, committed recipe (RECIPE below: fixed gallery
   size/seed, fixed step count, fixed optimizer schedule) so two fresh
   workers produce the same model and the same decoded-length
   distribution (round-4 verdict item 4). Trained params are cached
   under /tmp keyed by a hash of the recipe; the cache is validated
   against param paths, SHAPES, and the recipe hash — never reused
   across recipe changes;
2. measures decode p50 at B=64 over held-out val batches with early exit
   active, sweeping chunk K (early-exit granularity vs dispatch count);
3. prints the decoded-length distribution so the number is honest about
   what "typical length" meant.

Run: PYTHONPATH=/root/repo python tools/bench_decode_realistic.py
"""

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

EOS_ID = 2
DEC_T = 192
DEC_B = 64

# The committed training recipe. Changing ANY field changes the cache key,
# so a stale /tmp cache can never masquerade as the current recipe.
# steps=2000 was picked on-chip: the fixed-step model reaches >95% greedy
# EOS termination on held-out batches (measured round 5); fixed steps —
# not an EOS-conditional stop — keep the artifact deterministic.
RECIPE = dict(
    gallery_n=20_000, gallery_classes=64, gallery_seed=11, shard_seed=5,
    bucket=96, grid_resolution=100, train_b=512, steps=2000, seed=0,
    warmup_steps=600, peak_scale=2.0,
    d_model=256, num_layers=8, num_heads=2, dff=512, lowerdim=256,
    dropout=0.1, dtype="bfloat16", max_len=DEC_T,
)
RECIPE_HASH = hashlib.sha1(
    json.dumps(RECIPE, sort_keys=True).encode()).hexdigest()[:12]
PARAMS_CACHE = f"/tmp/sketchformer_tpu_flagship_{RECIPE_HASH}.npz"
TRAIN_B = RECIPE["train_b"]


def _note(msg):
    print(msg, file=sys.stderr, flush=True)


def _flagship(vocab_size, num_classes):
    from sketchformer_tpu.models import Sketchformer, SketchformerConfig

    cfg = SketchformerConfig(
        vocab_size=vocab_size, num_classes=num_classes,
        max_len=RECIPE["max_len"], d_model=RECIPE["d_model"],
        num_layers=RECIPE["num_layers"], num_heads=RECIPE["num_heads"],
        dff=RECIPE["dff"], dropout=RECIPE["dropout"],
        lowerdim=RECIPE["lowerdim"], dtype=RECIPE["dtype"],
        attn_impl="pallas")
    return Sketchformer(cfg)


def _save_params(path, params):
    import jax

    leaves, _ = jax.tree_util.tree_flatten_with_path(params)
    arrays = {str(p): np.asarray(v) for p, v in leaves}
    arrays["__recipe_hash__"] = np.frombuffer(
        RECIPE_HASH.encode(), dtype=np.uint8)
    np.savez(path, **arrays)


def _load_params(path, template):
    """Validated load: param paths, shapes, AND recipe hash must match."""
    import jax

    with np.load(path) as data:
        files = set(data.files)
        if "__recipe_hash__" not in files:
            return None
        if bytes(data["__recipe_hash__"]).decode() != RECIPE_HASH:
            return None
        leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
        if {str(p) for p, _ in leaves} != files - {"__recipe_hash__"}:
            return None
        vals = []
        for p, tmpl in leaves:
            v = data[str(p)]
            if v.shape != np.shape(tmpl):
                return None
            vals.append(v)
        return jax.tree_util.tree_unflatten(treedef, vals)


def _gallery_and_val():
    from tools.bench_embed_pipeline import prepare_gallery
    from sketchformer_tpu.data.registry import DistributedStroke3Loader

    data_dir = prepare_gallery(RECIPE["gallery_n"])
    loader = DistributedStroke3Loader(
        data_dir, batch_size=TRAIN_B, buckets=(RECIPE["bucket"],),
        grid_resolution=RECIPE["grid_resolution"], seed=RECIPE["seed"],
        process_index=0, process_count=1)
    val = []
    for b in loader.batch_iterator("valid"):
        if b["enc"].shape[0] == TRAIN_B:
            val.append(b)
        if len(val) >= 4:
            break
    if not val:  # 20k gallery's valid split yields partial batches only
        for b in loader.batch_iterator("valid"):
            val.append(b)
            if len(val) >= 4:
                break
    return loader, val


def get_trained_flagship(max_seconds: float = 300.0, verbose: bool = True):
    """(model, params, val_batches) trained with the committed RECIPE, or
    (None, None, None) if the wall-clock cap fires before the fixed step
    count completes (bench.py then SKIPS the section rather than report a
    nondeterministic half-trained model)."""
    import jax

    from sketchformer_tpu.infer.decode import make_token_decoder

    loader, val = _gallery_and_val()
    model = _flagship(loader.vocab_size, loader.num_classes)

    from sketchformer_tpu.train.schedule import make_optimizer
    from sketchformer_tpu.train.step import create_train_state, make_train_step

    tx = make_optimizer(model.config.d_model,
                        warmup_steps=RECIPE["warmup_steps"],
                        peak_scale=RECIPE["peak_scale"])
    if os.path.exists(PARAMS_CACHE):
        probe = create_train_state(
            model, tx, jax.random.PRNGKey(RECIPE["seed"]), val[0])
        cached = _load_params(PARAMS_CACHE, probe.params)
        if cached is not None:
            if verbose:
                _note(f"using cached trained params ({RECIPE_HASH})")
            # device_put ONCE: numpy leaves would be re-uploaded through
            # the remote link on EVERY decode call (measured: ~1.8 s/rep
            # against a 41 ms decode — the params tree dominates), while
            # freshly-trained params are already device-resident
            return model, jax.device_put(cached), val

    from itertools import cycle

    from sketchformer_tpu.data.packed import pack_batch
    from sketchformer_tpu.data.prefetch import device_prefetch

    train_batches = []
    for b in loader.batch_iterator("train"):
        if b["enc"].shape[0] == TRAIN_B:
            train_batches.append(pack_batch(b))
        if len(train_batches) >= 48:
            break
    state = create_train_state(
        model, tx, jax.random.PRNGKey(RECIPE["seed"]), train_batches[0])
    step = make_train_step(model, tx)
    decode_probe = make_token_decoder(model, max_len=DEC_T)
    feed = device_prefetch(cycle(train_batches), depth=2)
    t0 = time.perf_counter()
    done_steps = 0
    while done_steps < RECIPE["steps"]:
        chunk = min(250, RECIPE["steps"] - done_steps)
        for _ in range(chunk):
            state, m = step(state, next(feed))
        done_steps += chunk
        loss = float(np.asarray(m["loss"]))  # forces completion
        dt = time.perf_counter() - t0
        if verbose:
            ids = np.asarray(
                decode_probe(state.params, val[0]["enc"][:DEC_B]))
            term = float((ids == EOS_ID).any(axis=1).mean())
            _note(f"step {done_steps}/{RECIPE['steps']}: loss {loss:.3f}, "
                  f"EOS-terminated {term:.0%} ({dt:.0f}s)")
        if dt > max_seconds and done_steps < RECIPE["steps"]:
            _note(f"wall-clock cap {max_seconds:.0f}s hit at step "
                  f"{done_steps}; skipping (no partial cache written)")
            return None, None, None
    _save_params(PARAMS_CACHE, state.params)
    return model, state.params, val


def measure(model, params, val, ks=(8, 16, 32), reps=5, verbose=True):
    """p50 decode latency per chunk K over held-out batches; returns
    {f'decode_p50_ms_realistic_K{k}': ms} plus length stats."""
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
        # min is robust to transient remote-link stalls (a single healthy
        # rep bounds the true device+dispatch cost from above)
        out[f"decode_min_ms_realistic_K{k}"] = round(
            float(np.min(lat)) * 1e3, 2)
        if lengths is None:
            has = (ids == EOS_ID).any(axis=1)
            first = np.where(has, np.argmax(ids == EOS_ID, axis=1) + 1,
                             DEC_T)
            lengths = dict(
                terminated_frac=round(float(has.mean()), 3),
                len_mean=round(float(first.mean()), 1),
                len_p90=int(np.percentile(first, 90)))
    out.update(lengths)
    out["realistic_recipe"] = RECIPE_HASH
    if verbose:
        for k, v in out.items():
            _note(f"{k}: {v}")
    return out


def main():
    import jax

    from sketchformer_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    jax.config.update("jax_default_prng_impl", "rbg")
    # bench.py runs this as a fresh subprocess (per-session bulk-RPC
    # degradation isolation) and bounds the training leg via this env var
    cap = float(os.environ.get("SKETCHFORMER_REALISTIC_CAP_S", "900"))
    model, params, val = get_trained_flagship(max_seconds=cap)
    if model is None:
        _note("training did not complete within cap; no measurement")
        return
    print(json.dumps(measure(model, params, val)), flush=True)


if __name__ == "__main__":
    main()
