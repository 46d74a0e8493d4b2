"""Standalone repro for the TPU scan-length == KV-cache-size NaN bug.

Round-1 bisect finding (models/sketchformer.py CACHE_PAD): on this
environment's TPU runtime, a KV-cached AR decode whose step-loop length T
EXACTLY equals the cache's time dimension produces all-NaN decoder outputs;
any cache strictly larger than T is fine. The production fix pads the cache
by CACHE_PAD=8 slots. This script pins the trigger so the workaround can be
retired the day the runtime bug disappears.

MINIMAL TRIGGER (re-confirmed on this runtime, 2026-08-16, jax 0.9 + axon
PJRT + libtpu 0.0.34):

    python tools/repro_scan_cache_nan.py --mode cont
    -> pad=0 scan decode: nonfinite_xy == B*T*2 (every output NaN)
       pad=8 scan decode: finite
       pad=0 WHILE-LOOP decode: finite   <- scan-specific miscompile
       pad=0 single decode_step standalone: finite

i.e. the bug needs ALL of: (a) continuous/MDN decode, (b) the fixed-T
``lax.scan`` step loop, (c) cache time-dim exactly == scan length, (d) the
flagship trunk size (d_model=256, 8 layers; tiny trunks don't trigger),
(e) TPU backend (CPU is clean). Token-mode decode and the early-exit
``lax.while_loop`` variant (the production default since round 2) do NOT
trigger it at these shapes — CACHE_PAD is kept anyway as defense in depth
and because round 1 observed the token path misbehave at T=192 too.

Regression guard: tests/test_decode.py::test_cache_pad_regression pins the
pad; this script is the manual reproducer.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-len", type=int, default=192)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--d-model", type=int, default=256)
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--heads", type=int, default=2)
    ap.add_argument("--attn-impl", default="pallas")
    ap.add_argument("--mode", default="tok", choices=["tok", "cont"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from sketchformer_tpu.infer import decode as dec
    from sketchformer_tpu.models import Sketchformer, SketchformerConfig

    on_tpu = jax.default_backend() == "tpu"
    cfg = SketchformerConfig(
        vocab_size=36, num_classes=4, max_len=args.max_len,
        d_model=args.d_model, num_layers=args.layers, num_heads=args.heads,
        dff=2 * args.d_model, dropout=0.0, lowerdim=max(16, args.d_model // 2),
        num_queries=2, use_continuous=(args.mode == "cont"), num_mixtures=20,
        attn_impl=args.attn_impl if on_tpu else "xla",
        dtype="bfloat16" if on_tpu else "float32")
    model = Sketchformer(cfg)
    rng = np.random.default_rng(0)
    if cfg.use_continuous:
        enc = rng.standard_normal(
            (args.batch, cfg.max_len, 3)).astype(np.float32)
        mask = np.ones((args.batch, cfg.max_len), np.float32)
        dec_in5 = rng.standard_normal(
            (args.batch, cfg.max_len, 5)).astype(np.float32)
        params = model.init(
            jax.random.PRNGKey(0), jnp.asarray(enc), jnp.asarray(dec_in5),
            jnp.asarray(mask), jnp.asarray(mask))["params"]
    else:
        enc = rng.integers(4, cfg.vocab_size,
                           size=(args.batch, cfg.max_len)).astype(np.int32)
        enc[:, -4:] = 0
        enc[:, -5] = 2  # EOS
        dec_in = np.roll(enc, 1, axis=1)
        dec_in[:, 0] = 1
        params = model.init(jax.random.PRNGKey(0), jnp.asarray(enc),
                            jnp.asarray(dec_in))["params"]

    results = {}
    for pad in (8, 0):
        out = {}
        if cfg.use_continuous:
            import functools

            for name, early in (("scan", False), ("while", True)):
                # thread cache_pad via the module-level builder
                orig = dec._build_cache
                dec._build_cache = functools.partial(orig, cache_pad=pad)
                try:
                    xy, pen, valid = dec.make_cont_decoder(
                        model, temperature=0.6, early_exit=early)(
                            params, jnp.asarray(enc), jnp.asarray(mask),
                            jax.random.PRNGKey(1))
                finally:
                    dec._build_cache = orig
                xy = np.asarray(xy, np.float32)
                out[name] = {
                    "all_pad_rows": int(
                        (~np.asarray(valid)).all(axis=1).sum()),
                    "nonfinite_xy": int((~np.isfinite(xy)).sum()),
                    "unique_first_tokens": int(
                        len(np.unique(np.asarray(pen)[:, 0]))),
                }
        else:
            # the fixed-T scan is the shape that bisected to the bug; run
            # the while_loop variant too in case the trigger migrates
            for name, early in (("scan", False), ("while", True)):
                ids = np.asarray(dec.make_token_decoder(
                    model, early_exit=early, cache_pad=pad)(
                        params, jnp.asarray(enc)))
                # NaN logits argmax to token 0 (PAD is masked to -inf, so a
                # healthy decode never emits it); all-PAD rows = symptom
                out[name] = {
                    "all_pad_rows": int((ids == 0).all(axis=1).sum()),
                    "unique_first_tokens": int(len(np.unique(ids[:, 0]))),
                }
        # direct probe: one decode_step against a T-sized cache, checking
        # logits finiteness (the raw symptom, independent of argmax)
        if cfg.use_continuous:
            _, memory, memory_mask = model.apply(
                {"params": params}, jnp.asarray(enc), jnp.asarray(mask),
                method=Sketchformer.encode)
        else:
            _, memory, memory_mask = model.apply(
                {"params": params}, jnp.asarray(enc),
                method=Sketchformer.encode)
        cache = dec._build_cache(
            model, params, args.batch, memory, memory_mask, cache_pad=pad)
        probe_in = (
            jnp.zeros((args.batch, 1, 5), jnp.float32) if cfg.use_continuous
            else jnp.full((args.batch, 1), 1, jnp.int32))
        step_out, _ = model.apply(
            {"params": params, "cache": cache},
            probe_in, memory, memory_mask,
            jnp.int32(0), method=Sketchformer.decode_step, mutable=["cache"])
        out["step0_logits_finite"] = bool(
            np.isfinite(np.asarray(step_out, np.float32)).all())
        results[f"pad{pad}"] = out
        print(json.dumps({"cache_pad": pad, **out}))

    healthy = results["pad8"]
    suspect = results["pad0"]
    reproduced = (
        not suspect["step0_logits_finite"]
        or suspect["scan"]["all_pad_rows"] > healthy["scan"]["all_pad_rows"]
        or suspect["scan"].get("nonfinite_xy", 0) >
        healthy["scan"].get("nonfinite_xy", 0)
    )
    print(json.dumps({
        "backend": jax.default_backend(),
        "bug_reproduced": bool(reproduced),
        "note": "expected true on TPU (this runtime), false on CPU",
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
