"""Weight-import harness: template dump + round-trip through fake ref npz."""

import json
import subprocess
import sys
import os

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, "tools", "import_reference_weights.py")
TINY = ("d_model=32,num_layers=1,num_heads=2,dff=64,lowerdim=16,"
        "num_queries=2,max_len=32,vocab_size=68,num_classes=5,dropout=0.0")


def _run(*args):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + ":" + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = ""
    return subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "import runpy, sys; sys.argv = ['tool'] + sys.argv[1:];"
         f"runpy.run_path({TOOL!r}, run_name='__main__')",
         *args],
        env=env, capture_output=True, text=True)


def test_template_then_import_roundtrip(tmp_path):
    tmpl = str(tmp_path / "map.json")
    r = _run("--hparams", TINY, "--dump-template", tmpl)
    assert r.returncode == 0, r.stderr[-800:]
    mapping = json.load(open(tmpl))
    assert any("encoder" in k for k in mapping)

    # fabricate a "reference checkpoint": random arrays named ref/<i>
    weights = {}
    for i, (path, spec) in enumerate(mapping.items()):
        name = f"ref/{i}"
        weights[name] = np.random.default_rng(i).standard_normal(
            spec["shape"]).astype(np.float32)
        spec["ref"] = name
    json.dump(mapping, open(tmpl, "w"))
    wpath = str(tmp_path / "w.npz")
    np.savez(wpath, **weights)

    out = str(tmp_path / "imported")
    r = _run("--hparams", TINY, "--weights", wpath, "--mapping", tmpl,
             "--out", out)
    assert r.returncode == 0, r.stderr[-800:]
    assert os.path.exists(os.path.join(out, "config.json"))
    assert os.path.isdir(os.path.join(out, "checkpoints"))


def test_import_rejects_shape_mismatch(tmp_path):
    tmpl = str(tmp_path / "map.json")
    assert _run("--hparams", TINY, "--dump-template", tmpl).returncode == 0
    mapping = json.load(open(tmpl))
    weights = {}
    for i, (path, spec) in enumerate(mapping.items()):
        name = f"ref/{i}"
        shape = list(spec["shape"])
        if i == 0:
            shape = [s + 1 for s in shape]  # corrupt one
        weights[name] = np.zeros(shape, np.float32)
        spec["ref"] = name
    json.dump(mapping, open(tmpl, "w"))
    wpath = str(tmp_path / "w.npz")
    np.savez(wpath, **weights)
    r = _run("--hparams", TINY, "--weights", wpath, "--mapping", tmpl,
             "--out", str(tmp_path / "o"))
    assert r.returncode == 1
    assert "SHAPE MISMATCH" in r.stderr
