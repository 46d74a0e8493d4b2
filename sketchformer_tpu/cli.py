"""Command-line interface: train / eval / embed / decode / prep-data / bench.

Capability parity with the reference's entry points (reference: train.py —
``python train.py <model> --data-loader ... --hparams k=v,...`` plus the
notebook/eval scripts), widened into proper subcommands::

    python -m sketchformer_tpu.cli train   --preset tok2tok_cls_cpu --run-dir out/exp1
    python -m sketchformer_tpu.cli train   --model sketchformer --loader synthetic ...
    python -m sketchformer_tpu.cli eval    --run-dir out/exp1
    python -m sketchformer_tpu.cli embed   --run-dir out/exp1 --output z.npz
    python -m sketchformer_tpu.cli decode  --run-dir out/exp1 --output recon.npz
    python -m sketchformer_tpu.cli prep-data --input-dir quickdraw/ --out-dir shards/
    python -m sketchformer_tpu.cli bench   [--preset ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Any, Dict

import numpy as np


def _parse_kv(items) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for item in items or []:
        k, v = item.split("=", 1)
        try:
            out[k] = json.loads(v)
        except json.JSONDecodeError:
            # Python-style literals: 'token_mode=False' must not silently
            # become the TRUTHY string "False" (a cont-mode run would get
            # a token-mode loader and die on a missing enc_mask)
            lit = {"true": True, "false": False, "none": None}
            out[k] = lit[v.lower()] if v.lower() in lit else v
    return out


def _resolve_loader_config(args):
    """(loader_name, loader_kwargs) from preset and/or explicit flags."""
    from sketchformer_tpu.presets import get_preset

    loader_name = args.loader
    loader_kwargs: Dict[str, Any] = {}
    if args.preset:
        p = get_preset(args.preset)
        loader_name = loader_name or p.loader
        loader_kwargs.update(p.loader_kwargs)
    loader_name = loader_name or "synthetic"
    loader_kwargs.update(_parse_kv(getattr(args, "loader_arg", None)))
    if getattr(args, "data_dir", None):
        loader_kwargs["data_dir"] = args.data_dir
    return loader_name, loader_kwargs


def _build_from_args(args):
    """Resolve (model, loader, loop_cfg) from preset and/or explicit flags."""
    from sketchformer_tpu.data.registry import get_dataloader_by_name
    from sketchformer_tpu.models import SketchformerConfig, Sketchformer
    from sketchformer_tpu.presets import get_preset
    from sketchformer_tpu.train.loop import TrainLoopConfig

    model_over: Dict[str, Any] = {}
    loop_over: Dict[str, Any] = {}
    if args.preset:
        p = get_preset(args.preset)
        model_over.update(p.model_overrides)
        loop_over.update(p.loop_overrides)

    loader_name, loader_kwargs = _resolve_loader_config(args)
    loader = get_dataloader_by_name(loader_name)(**loader_kwargs)

    hps = SketchformerConfig.default_hparams()
    for k, v in model_over.items():
        setattr(hps, k, v)
    if getattr(args, "hparams", None):
        hps.parse(args.hparams)
    # dataset-derived fields unless explicitly overridden
    explicit = set()
    for item in (args.hparams or "").split(","):
        if "=" in item:
            explicit.add(item.split("=", 1)[0].strip())
    if "vocab_size" not in explicit:
        hps.vocab_size = loader.vocab_size
    if "num_classes" not in explicit and not args.preset:
        hps.num_classes = loader.num_classes
    elif "num_classes" not in explicit and args.preset:
        hps.num_classes = max(loader.num_classes, hps.num_classes)
    cfg = SketchformerConfig.from_hparams(hps)
    model = Sketchformer(cfg)

    loop_over.update(_parse_kv(getattr(args, "loop_arg", None)))
    loop_cfg = TrainLoopConfig(**loop_over)
    return model, loader, loop_cfg


def _restore_for_inference(args):
    """Rebuild model + latest checkpoint params from a run dir."""
    import jax

    from sketchformer_tpu.train.checkpoint import CheckpointManager
    from sketchformer_tpu.train.schedule import make_optimizer
    from sketchformer_tpu.train.step import create_train_state
    from sketchformer_tpu.models import SketchformerConfig, Sketchformer

    ckpt = CheckpointManager(args.run_dir)
    saved = ckpt.load_config_dict()
    if saved is None:
        raise FileNotFoundError(f"no config.json in {args.run_dir}")
    cfg = SketchformerConfig(**saved)
    model = Sketchformer(cfg)
    meta = ckpt.load_meta()
    explicit = bool(args.loader or args.preset or
                    getattr(args, "loader_arg", None) or
                    getattr(args, "data_dir", None))
    if not explicit and "loader" in meta:
        # rebuild the run's own loader/tokenizer from persisted data config
        from sketchformer_tpu.data.registry import get_dataloader_by_name

        loader = get_dataloader_by_name(meta["loader"])(
            **meta["loader_kwargs"])
    else:
        _, loader, _ = _build_from_args(args)
    first = next(loader.batch_iterator("valid"))
    tx = make_optimizer(cfg.d_model)
    template = create_train_state(model, tx, jax.random.PRNGKey(0), first)
    state = ckpt.restore(template)  # adapts template rng via run_meta
    ckpt.close()
    return model, loader, state.params


# ---------------------------------------------------------------------------
# subcommands
# ---------------------------------------------------------------------------


def cmd_train(args) -> int:
    from sketchformer_tpu.train.loop import run_training
    from sketchformer_tpu.utils.notify import build_notifier

    model, loader, loop_cfg = _build_from_args(args)
    loop_cfg.prng_impl = args.prng
    # persist the data config so inference subcommands can rebuild the SAME
    # loader/tokenizer without the user re-passing every flag
    from sketchformer_tpu.train.checkpoint import CheckpointManager

    loader_name, loader_kwargs = _resolve_loader_config(args)
    mgr = CheckpointManager(args.run_dir)
    mgr.save_meta({"loader": loader_name, "loader_kwargs": loader_kwargs})
    mgr.close()
    mesh = None
    if args.mesh:
        from sketchformer_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(model_parallelism=args.model_parallelism)
    notifier = build_notifier(args.notifier, args.run_dir)
    final = run_training(
        model, loader, args.run_dir, loop_cfg, mesh=mesh, notifier=notifier)
    print(json.dumps({k: round(v, 4) for k, v in final.items()}))
    return 0


def cmd_eval(args) -> int:
    from sketchformer_tpu.train.step import make_eval_step

    model, loader, params = _restore_for_inference(args)
    eval_step = make_eval_step(model)
    if args.split == "valid":
        batches = loader.get_validation_set(max_batches=args.max_batches)
    else:
        batches = []
        for b in loader.batch_iterator(args.split):
            batches.append(b)
            if len(batches) >= args.max_batches:
                break
    acc: Dict[str, float] = {}
    for b in batches:
        m = eval_step(params, b)
        for k, v in m.items():
            acc[k] = acc.get(k, 0.0) + float(v)
    if not batches:
        print(f"no batches in split {args.split!r}", file=sys.stderr)
        return 1
    out = {k: round(v / len(batches), 4) for k, v in acc.items()}
    print(json.dumps(out))
    return 0


def cmd_embed(args) -> int:
    from sketchformer_tpu.infer.encode import embed_dataset

    model, loader, params = _restore_for_inference(args)
    batches = loader.get_validation_set(max_batches=args.max_batches)
    Z, labels = embed_dataset(model, params, batches)
    np.savez(args.output, embeddings=Z, labels=labels)
    print(json.dumps({"embeddings": list(Z.shape), "output": args.output}))
    return 0


def cmd_decode(args) -> int:
    import jax

    from sketchformer_tpu.infer import decode as dec

    model, loader, params = _restore_for_inference(args)
    batch = loader.get_validation_set(max_batches=1)[0]
    if model.config.use_continuous:
        decode = dec.make_cont_decoder(model, temperature=args.temperature)
        xy, pen, valid = decode(
            params, batch["enc"], batch["enc_mask"], jax.random.PRNGKey(0))
        sketches = dec.cont_to_sketches(
            np.asarray(xy), np.asarray(pen), np.asarray(valid),
            scale=loader.scale)
    else:
        ids = dec.make_token_decoder(model)(params, batch["enc"])
        sketches = dec.tokens_to_sketches(loader.tokenizer, np.asarray(ids))
    offsets = np.zeros(len(sketches) + 1, np.int64)
    offsets[1:] = np.cumsum([len(s) for s in sketches])
    points = (np.concatenate(sketches, axis=0)
              if any(len(s) for s in sketches) else np.zeros((0, 3)))
    np.savez(args.output, points=points, offsets=offsets,
             labels=batch["label"])
    print(json.dumps({
        "sketches": len(sketches),
        "nonempty": int(sum(len(s) > 0 for s in sketches)),
        "output": args.output,
    }))
    return 0


def cmd_sbir(args) -> int:
    """Gallery retrieval eval: embed a gallery + queries, kNN metrics.

    Default protocol: DISJOINT query/gallery halves (query sketch never in
    the gallery — the honest retrieval variant). ``--self-retrieval``
    evaluates Z against itself with the diagonal excluded instead.
    """
    from sketchformer_tpu.infer.encode import embed_dataset
    from sketchformer_tpu.infer.sbir import retrieval_eval

    model, loader, params = _restore_for_inference(args)
    batches = loader.get_validation_set(max_batches=args.max_batches)
    Z, labels = embed_dataset(model, params, batches)
    if args.self_retrieval or len(Z) < 4:
        metrics = retrieval_eval(Z, labels, Z, labels, exclude_self=True)
        metrics["protocol"] = "self"
    else:
        half = len(Z) // 2
        metrics = retrieval_eval(
            Z[:half], labels[:half], Z[half:], labels[half:])
        metrics["protocol"] = "disjoint"
    metrics["gallery_size"] = len(Z) if args.self_retrieval else len(Z) - len(Z) // 2
    if args.output:
        np.savez(args.output, embeddings=Z, labels=labels)
    print(json.dumps({
        k: (round(float(v), 4) if not isinstance(v, str) else v)
        for k, v in metrics.items()}))
    return 0


def cmd_interpolate(args) -> int:
    """Latent interpolation between two val sketches, decoded + rendered.

    Reference parity: the paper's latent-space interpolation demo
    (basic_usage notebook); here it's a first-class subcommand producing an
    npz of decoded sketches plus a raster strip.
    """
    import jax

    from sketchformer_tpu.infer import decode as dec
    from sketchformer_tpu.infer.encode import interpolate, make_embed_fn
    from sketchformer_tpu.utils.metrics import sketch_strip

    model, loader, params = _restore_for_inference(args)
    batch = loader.get_validation_set(max_batches=1)[0]
    embed = make_embed_fn(model)
    if model.config.use_continuous:
        Z = np.asarray(embed(params, batch["enc"], batch["enc_mask"]))
    else:
        Z = np.asarray(embed(params, batch["enc"]))
    i, j = args.index_a, args.index_b
    if j is None:  # default: first sketch with a different label
        labels = np.asarray(batch["label"])
        distinct = np.flatnonzero(labels != labels[i])
        j = int(distinct[0]) if len(distinct) else (i + 1) % len(Z)
    path = interpolate(Z[i], Z[j], steps=args.steps).astype(Z.dtype)
    if model.config.use_continuous:
        decode = dec.make_cont_decoder_from_z(
            model, temperature=args.temperature)
        xy, pen, valid = decode(params, path, jax.random.PRNGKey(0))
        sketches = dec.cont_to_sketches(
            np.asarray(xy), np.asarray(pen), np.asarray(valid),
            scale=loader.scale)
    else:
        ids = dec.make_token_decoder_from_z(model)(params, path)
        sketches = dec.tokens_to_sketches(loader.tokenizer, np.asarray(ids))
    offsets = np.zeros(len(sketches) + 1, np.int64)
    offsets[1:] = np.cumsum([len(s) for s in sketches])
    points = (np.concatenate(sketches, axis=0)
              if any(len(s) for s in sketches) else np.zeros((0, 3)))
    strip = sketch_strip(sketches)
    np.savez(args.output, points=points, offsets=offsets,
             embeddings=path, strip=strip)
    print(json.dumps({
        "steps": args.steps, "index_a": i, "index_b": j,
        "nonempty": int(sum(len(s) > 0 for s in sketches)),
        "output": args.output,
    }))
    return 0


def cmd_prep_data(args) -> int:
    """QuickDraw per-class npz -> class-mixed shards (+ optional codebook)."""
    from sketchformer_tpu.data import stroke3
    from sketchformer_tpu.data.shards import write_shards
    from sketchformer_tpu.data.tokenizer import DictionaryTokenizer

    sketches, labels, names = [], [], []
    exts = (".npz", ".ndjson") if args.format == "auto" else (
        "." + args.format,)
    files = sorted(
        f for f in os.listdir(args.input_dir) if f.endswith(exts))
    if not files:
        print(f"no {exts} files in {args.input_dir}", file=sys.stderr)
        return 1
    for ci, fname in enumerate(files):
        names.append(os.path.splitext(fname)[0])
        path = os.path.join(args.input_dir, fname)
        if fname.endswith(".npz"):
            # Google sketch-rnn release: per-class npz of stroke-3 arrays
            with np.load(path, allow_pickle=True, encoding="latin1") as data:
                for split in ("train", "valid", "test"):
                    if split not in data:
                        continue
                    for sk in data[split][: args.per_class_limit]:
                        sk = np.asarray(sk, dtype=np.float32)
                        if args.rdp_epsilon > 0:
                            sk = stroke3.rdp_simplify(sk, args.rdp_epsilon)
                        sketches.append(sk)
                        labels.append(ci)
        else:
            # QuickDraw raw/simplified ndjson: one JSON drawing per line,
            # "drawing" = list of strokes, each [[x...], [y...], (t...)]
            count = 0
            with open(path) as f:
                for line in f:
                    if args.per_class_limit and count >= args.per_class_limit:
                        break
                    rec = json.loads(line)
                    lines_xy = [
                        np.stack([s[0], s[1]], axis=1).astype(np.float32)
                        for s in rec["drawing"] if len(s[0])
                    ]
                    if not lines_xy:
                        continue
                    sk = stroke3.lines_to_strokes(lines_xy)
                    if args.rdp_epsilon > 0:
                        sk = stroke3.rdp_simplify(sk, args.rdp_epsilon)
                    sketches.append(sk)
                    labels.append(ci)
                    count += 1
    labels_arr = np.asarray(labels, np.int32)
    write_shards(args.out_dir, sketches, labels_arr, names,
                 shard_size=args.shard_size, seed=args.seed)
    if args.fit_dictionary:
        scale = stroke3.compute_deviation(sketches)
        norm = [stroke3.normalize(s, scale) for s in sketches[:20000]]
        tok = DictionaryTokenizer.fit(norm, num_tokens=args.dict_size)
        tok.save(os.path.join(args.out_dir, "dictionary.npz"))
    print(json.dumps({
        "classes": len(names), "sketches": len(sketches),
        "out_dir": args.out_dir,
    }))
    return 0


def cmd_bench(args) -> int:
    import subprocess

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return subprocess.call(
        [sys.executable, os.path.join(repo_root, "bench.py")])


# ---------------------------------------------------------------------------


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="sketchformer_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp, run_dir_required=True):
        sp.add_argument("--preset", default=None)
        sp.add_argument("--loader", default=None)
        sp.add_argument("--data-dir", default=None)
        sp.add_argument("--hparams", default=None,
                        help="model overrides: k=v,k=v")
        sp.add_argument("--loader-arg", action="append", default=[],
                        help="loader kwarg k=v (repeatable)")
        sp.add_argument("--run-dir", required=run_dir_required)

    sp = sub.add_parser("train", help="train a model")
    common(sp)
    sp.add_argument("--loop-arg", action="append", default=[],
                    help="loop config k=v (repeatable)")
    sp.add_argument("--mesh", action="store_true",
                    help="shard over all visible devices")
    sp.add_argument("--model-parallelism", type=int, default=1)
    sp.add_argument("--notifier", default="file",
                    help="none | file | webhook:<url>")
    sp.add_argument("--prng", default="rbg",
                    choices=["rbg", "threefry2x32"],
                    help="dropout PRNG impl (rbg is ~28%% faster steps)")
    sp.set_defaults(fn=cmd_train)

    sp = sub.add_parser("eval", help="evaluate latest checkpoint")
    common(sp)
    sp.add_argument("--max-batches", type=int, default=8)
    sp.add_argument("--split", default="valid",
                    choices=["train", "valid", "test"])
    sp.set_defaults(fn=cmd_eval)

    sp = sub.add_parser("embed", help="extract bottleneck embeddings")
    common(sp)
    sp.add_argument("--max-batches", type=int, default=8)
    sp.add_argument("--output", default="embeddings.npz")
    sp.set_defaults(fn=cmd_embed)

    sp = sub.add_parser("sbir", help="gallery retrieval eval (top-k, mAP)")
    common(sp)
    sp.add_argument("--max-batches", type=int, default=16)
    sp.add_argument("--self-retrieval", action="store_true",
                    help="eval Z vs itself (diag excluded) instead of "
                         "disjoint query/gallery halves")
    sp.add_argument("--output", default=None,
                    help="optionally dump embeddings npz")
    sp.set_defaults(fn=cmd_sbir)

    sp = sub.add_parser("interpolate",
                        help="latent interpolation between two val sketches")
    common(sp)
    sp.add_argument("--steps", type=int, default=8)
    sp.add_argument("--index-a", type=int, default=0)
    sp.add_argument("--index-b", type=int, default=None,
                    help="default: first val sketch with a different label")
    sp.add_argument("--temperature", type=float, default=0.0)
    sp.add_argument("--output", default="interpolation.npz")
    sp.set_defaults(fn=cmd_interpolate)

    sp = sub.add_parser("decode", help="AR reconstruction of a val batch")
    common(sp)
    sp.add_argument("--temperature", type=float, default=0.0)
    sp.add_argument("--output", default="reconstructions.npz")
    sp.set_defaults(fn=cmd_decode)

    sp = sub.add_parser("prep-data",
                        help="QuickDraw per-class npz -> mixed shards")
    sp.add_argument("--input-dir", required=True)
    sp.add_argument("--out-dir", required=True)
    sp.add_argument("--format", default="auto",
                    choices=["auto", "npz", "ndjson"])
    sp.add_argument("--shard-size", type=int, default=2048)
    sp.add_argument("--per-class-limit", type=int, default=None)
    sp.add_argument("--rdp-epsilon", type=float, default=0.0,
                    help="re-simplify with RDP (QuickDraw ships simplified)")
    sp.add_argument("--fit-dictionary", action="store_true")
    sp.add_argument("--dict-size", type=int, default=1000)
    sp.add_argument("--seed", type=int, default=0)
    sp.set_defaults(fn=cmd_prep_data)

    sp = sub.add_parser("bench", help="run the repo benchmark")
    sp.set_defaults(fn=cmd_bench)
    return p


def main(argv=None) -> int:
    # persistent executable cache: slow-worker remote-compile resilience
    # (utils/compile_cache.py; SKETCHFORMER_NO_JAX_CACHE=1 opts out)
    from sketchformer_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
