"""Reference-checkpoint import harness (fidelity comparison scaffold).

The north star requires "top-1 within 0.2% of the reference checkpoint",
which cannot be verified in this environment (no network: no reference
checkpoint, no real QuickDraw — SURVEY.md hard-parts). This tool is the
piece that makes the comparison a one-command job the day artifacts appear:

1. ``--dump-template run_template.json`` — enumerate OUR param tree
   (path, shape, dtype) for a given model config, as the left column of the
   mapping. With ``--tf-ckpt`` the ``ref`` fields are AUTO-PROPOSED by
   shape matching against the checkpoint's variables (unique shape -> firm
   mapping; ambiguous shapes -> name-sorted zip flagged ``auto_ambiguous``
   for human review; 2-D transposed matches get ``transpose: [1, 0]``).
2. (If needed) fix up the ``ref`` fields — TF2 variable names come from
   ``tf.train.list_variables`` — and optional ``transpose`` axes.
3. ``--weights ref_weights.npz | --tf-ckpt <dir-or-prefix>`` plus
   ``--mapping run_template.json --out run_dir`` — build the flax param
   tree from the mapped arrays (shape-checked), wrap it in a fresh
   TrainState and save an orbax checkpoint that ``cli.py
   eval/embed/decode`` consume directly.

Usage:
    # one-command path for a real reference TF2 checkpoint:
    python tools/import_reference_weights.py --tf-ckpt ref_ckpt_dir \
        --dump-template map.json --hparams d_model=256,num_layers=8
    python tools/import_reference_weights.py --tf-ckpt ref_ckpt_dir \
        --mapping map.json --out out/reference_import
    # or from a hand-built npz:
    python tools/import_reference_weights.py --weights w.npz \
        --mapping map.json --out out/reference_import
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _flatten(tree, prefix=()):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
    else:
        out["/".join(prefix)] = tree
    return out


def _unflatten(flat):
    tree: dict = {}
    for path, leaf in flat.items():
        parts = path.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = leaf
    return tree


def _build_model(hparams_str):
    import jax

    from sketchformer_tpu.models import Sketchformer, SketchformerConfig

    hps = SketchformerConfig.default_hparams()
    if hparams_str:
        hps.parse(hparams_str)
    cfg = SketchformerConfig.from_hparams(hps)
    model = Sketchformer(cfg)
    rng = np.random.default_rng(0)
    if cfg.use_continuous:
        enc = rng.standard_normal((2, cfg.max_len, 3)).astype(np.float32)
        dec_in = rng.standard_normal((2, cfg.max_len, 5)).astype(np.float32)
        mask = np.ones((2, cfg.max_len), np.float32)
        params = model.init(
            jax.random.PRNGKey(0), enc, dec_in, mask, mask)["params"]
    else:
        enc = rng.integers(4, cfg.vocab_size, (2, cfg.max_len)).astype(np.int32)
        dec_in = np.roll(enc, 1, 1)
        dec_in[:, 0] = 1
        params = model.init(jax.random.PRNGKey(0), enc, dec_in)["params"]
    return model, cfg, params


class _TFCheckpointSource:
    """Tensor source over a TF2 checkpoint dir or prefix.

    Uses ``tf.train.load_checkpoint`` (TF is an optional dependency used
    only here and in data/tfrecord.py). Non-tensor bookkeeping entries
    (save counters, optimizer slots can be kept — they simply never match
    model shapes) are listed as-is.
    """

    def __init__(self, path: str) -> None:
        import tensorflow as tf  # lazy

        prefix = tf.train.latest_checkpoint(path) if os.path.isdir(path) else path
        if prefix is None:
            raise FileNotFoundError(f"no TF checkpoint under {path}")
        self._reader = tf.train.load_checkpoint(prefix)
        self.shapes = {
            name: tuple(shape)
            for name, shape in tf.train.list_variables(prefix)
            if "CHECKPOINTABLE_OBJECT_GRAPH" not in name
        }

    def __contains__(self, name: str) -> bool:
        return name in self.shapes

    def __getitem__(self, name: str) -> np.ndarray:
        return np.asarray(self._reader.get_tensor(name))


def _propose_mapping(template: dict, src: "_TFCheckpointSource") -> dict:
    """Fill empty ``ref`` fields by shape matching against the checkpoint.

    unique shape on both sides -> firm match; same-size ambiguous groups ->
    name-sorted zip flagged ``auto_ambiguous``; a 2-D variable whose
    TRANSPOSED shape matches uniquely gets ``transpose: [1, 0]`` (TF dense
    kernels are (in, out) like flax, but conventions vary per repo).
    """
    ours_by_shape: dict = {}
    for path, spec in template.items():
        ours_by_shape.setdefault(tuple(spec["shape"]), []).append(path)
    refs_by_shape: dict = {}
    for name, shape in src.shapes.items():
        refs_by_shape.setdefault(tuple(shape), []).append(name)

    for shape, paths in ours_by_shape.items():
        names = sorted(refs_by_shape.get(shape, []))
        transpose = None
        if not names and len(shape) == 2 and shape[0] != shape[1]:
            names = sorted(refs_by_shape.get(shape[::-1], []))
            transpose = [1, 0]
        if not names:
            continue
        ambiguous = len(paths) > 1 or len(names) > 1
        for path, name in zip(sorted(paths), names):
            template[path]["ref"] = name
            template[path]["transpose"] = transpose
            if ambiguous:
                template[path]["auto_ambiguous"] = True
    return template


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hparams", default=None)
    ap.add_argument("--dump-template", default=None)
    ap.add_argument("--weights", default=None,
                    help="npz of ref-name -> array")
    ap.add_argument("--tf-ckpt", default=None,
                    help="TF2 checkpoint dir or prefix (direct ingestion)")
    ap.add_argument("--mapping", default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    model, cfg, params = _build_model(args.hparams)
    flat = _flatten(params)

    if args.dump_template:
        template = {
            path: {
                "shape": list(np.shape(leaf)),
                "dtype": str(np.asarray(leaf).dtype),
                "ref": "",          # TF2 variable name, to fill in
                "transpose": None,  # e.g. [1, 0] if the ref stores W^T
            }
            for path, leaf in sorted(flat.items())
        }
        if args.tf_ckpt:
            template = _propose_mapping(template, _TFCheckpointSource(args.tf_ckpt))
            n_auto = sum(1 for s in template.values() if s["ref"])
            n_amb = sum(1 for s in template.values()
                        if s.get("auto_ambiguous"))
            print(f"auto-proposed {n_auto}/{len(template)} refs "
                  f"({n_amb} ambiguous — review those)")
        with open(args.dump_template, "w") as f:
            json.dump(template, f, indent=2)
        print(f"wrote {len(template)}-entry template to {args.dump_template}")
        return 0

    if not ((args.weights or args.tf_ckpt) and args.mapping and args.out):
        print("need --weights|--tf-ckpt, --mapping and --out "
              "(or --dump-template)", file=sys.stderr)
        return 1

    with open(args.mapping) as f:
        mapping = json.load(f)
    ref = (_TFCheckpointSource(args.tf_ckpt) if args.tf_ckpt
           else dict(np.load(args.weights)))

    new_flat = {}
    missing, mismatched = [], []
    for path, leaf in flat.items():
        spec = mapping.get(path, {})
        name = spec.get("ref", "")
        if not name:
            missing.append(path)
            continue
        arr = np.asarray(ref[name])
        if spec.get("transpose"):
            arr = np.transpose(arr, spec["transpose"])
        if list(arr.shape) != list(np.shape(leaf)):
            mismatched.append((path, list(arr.shape), list(np.shape(leaf))))
            continue
        new_flat[path] = arr.astype(np.asarray(leaf).dtype)
    if missing or mismatched:
        for p in missing:
            print(f"UNMAPPED: {p}", file=sys.stderr)
        for p, got, want in mismatched:
            print(f"SHAPE MISMATCH: {p} ref{got} != ours{want}",
                  file=sys.stderr)
        return 1

    import jax

    from sketchformer_tpu.train.checkpoint import CheckpointManager
    from sketchformer_tpu.train.schedule import make_optimizer
    from sketchformer_tpu.train.step import TrainState

    new_params = _unflatten(new_flat)
    tx = make_optimizer(cfg.d_model)
    state = TrainState(
        new_params, tx.init(new_params),
        jax.numpy.zeros((), jax.numpy.int32), jax.random.PRNGKey(0))
    mgr = CheckpointManager(args.out, async_save=False)
    mgr.save_config(cfg)
    mgr.save(state, force=True)
    mgr.wait_until_finished()
    mgr.close()
    print(f"imported {len(new_flat)} tensors into {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
