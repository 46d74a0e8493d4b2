"""Golden-fixture fidelity tests (SURVEY.md §4.2): tiny fixed-seed forward
passes pinned against committed numpy fixtures. Any silent change to
initialization, layer wiring, masking, or numerics trips these.

Regenerate (only on INTENTIONAL model changes — document in the commit):
see the generation snippet in the git history of this file's fixtures.
"""

import pytest
import os

import jax
import jax.numpy as jnp
import numpy as np

from sketchformer_tpu.models import Sketchformer, SketchformerConfig

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def setup_module(module):
    # fixtures were generated at highest matmul precision on CPU
    jax.config.update("jax_default_matmul_precision", "highest")


def teardown_module(module):
    jax.config.update("jax_default_matmul_precision", None)


@pytest.mark.slow
def test_golden_tok_forward():
    data = np.load(os.path.join(FIXTURES, "golden_tok.npz"))
    cfg = SketchformerConfig(
        vocab_size=68, num_classes=5, max_len=16, d_model=16, num_layers=2,
        num_heads=2, dff=32, dropout=0.0, lowerdim=8, num_queries=2)
    model = Sketchformer(cfg)
    params = model.init(
        jax.random.PRNGKey(7), jnp.asarray(data["enc"]),
        jnp.asarray(data["dec_in"]))
    out = model.apply(
        params, jnp.asarray(data["enc"]), jnp.asarray(data["dec_in"]))
    np.testing.assert_allclose(
        np.asarray(out["recon"]), data["recon"], atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out["cls"]), data["cls"], atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out["embedding"]), data["embedding"], atol=1e-5, rtol=1e-5)


def test_golden_cont_forward():
    data = np.load(os.path.join(FIXTURES, "golden_cont.npz"))
    cfg = SketchformerConfig(
        vocab_size=1, num_classes=5, max_len=16, d_model=16, num_layers=2,
        num_heads=2, dff=32, dropout=0.0, lowerdim=8, num_queries=2,
        use_continuous=True, num_mixtures=3)
    model = Sketchformer(cfg)
    args = (jnp.asarray(data["enc"]), jnp.asarray(data["dec_in"]),
            jnp.asarray(data["mask"]), jnp.asarray(data["mask"]))
    params = model.init(jax.random.PRNGKey(7), *args)
    out = model.apply(params, *args)
    np.testing.assert_allclose(
        np.asarray(out["recon"]), data["recon"], atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out["cls"]), data["cls"], atol=1e-5, rtol=1e-5)
