"""MDN numerics against a from-scratch numpy oracle (SURVEY.md §4.1)."""

import jax
import jax.numpy as jnp
import numpy as np

from sketchformer_tpu.ops import mdn


def _numpy_gmm_ll(raw, M, xy):
    """Independent numpy implementation of the mixture log-likelihood."""
    pi_logits = raw[..., :M]
    mu_x, mu_y = raw[..., M : 2 * M], raw[..., 2 * M : 3 * M]
    ls_x = np.clip(raw[..., 3 * M : 4 * M], mdn.LOG_SIGMA_MIN, mdn.LOG_SIGMA_MAX)
    ls_y = np.clip(raw[..., 4 * M : 5 * M], mdn.LOG_SIGMA_MIN, mdn.LOG_SIGMA_MAX)
    rho = mdn.RHO_MAX * np.tanh(raw[..., 5 * M : 6 * M])
    log_pi = pi_logits - np.log(
        np.exp(pi_logits - pi_logits.max(-1, keepdims=True)).sum(-1, keepdims=True)
    ) - pi_logits.max(-1, keepdims=True)
    sx, sy = np.exp(ls_x), np.exp(ls_y)
    dx = (xy[..., :1] - mu_x) / sx
    dy = (xy[..., 1:2] - mu_y) / sy
    omr = np.maximum(1 - rho**2, 1e-6)
    z = dx**2 + dy**2 - 2 * rho * dx * dy
    comp = (
        -z / (2 * omr)
        - ls_x - ls_y
        - 0.5 * np.log(omr)
        - np.log(2 * np.pi)
    )
    a = log_pi + comp
    amax = a.max(-1)
    return amax + np.log(np.exp(a - amax[..., None]).sum(-1))


def test_gmm_ll_matches_numpy_oracle():
    M = 7
    rng = np.random.default_rng(0)
    raw = rng.standard_normal((3, 11, 6 * M + 3)).astype(np.float32) * 2
    xy = rng.standard_normal((3, 11, 2)).astype(np.float32)
    params = mdn.split_params(jnp.asarray(raw), M)
    got = np.asarray(mdn.gmm_log_likelihood(params, jnp.asarray(xy)))
    want = _numpy_gmm_ll(raw, M, xy)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_gmm_ll_is_a_density_1d_grid():
    """Integrating exp(ll) over a fine grid ≈ 1 for a simple mixture."""
    M = 2
    raw = np.zeros((6 * M + 3,), np.float32)
    raw[0:2] = [0.3, -0.4]          # pi logits
    raw[2:4] = [0.5, -1.0]          # mu_x
    raw[4:6] = [-0.3, 0.7]          # mu_y
    raw[6:10] = -0.5                # log sigmas
    raw[10:12] = 0.4                # rho raw
    params = mdn.split_params(jnp.asarray(raw), M)
    g = np.linspace(-6, 6, 201)
    xs, ys = np.meshgrid(g, g)
    pts = jnp.asarray(np.stack([xs.ravel(), ys.ravel()], -1).astype(np.float32))
    ll = np.asarray(mdn.gmm_log_likelihood(params, pts))
    integral = np.exp(ll).sum() * (g[1] - g[0]) ** 2
    assert abs(integral - 1.0) < 0.01


def test_mdn_loss_masking():
    M = 3
    rng = np.random.default_rng(1)
    raw = jnp.asarray(rng.standard_normal((2, 6, 6 * M + 3)).astype(np.float32))
    xy = jnp.asarray(rng.standard_normal((2, 6, 2)).astype(np.float32))
    pen = jnp.asarray(rng.integers(0, 3, (2, 6)).astype(np.int32))
    full = jnp.ones((2, 6), jnp.float32)
    half = full.at[:, 3:].set(0.0)
    l_full = mdn.mdn_loss(raw, M, xy, pen, full)
    l_half = mdn.mdn_loss(raw, M, xy, pen, half)
    # changing masked-out targets must not change the half-masked loss
    xy2 = xy.at[:, 3:].set(100.0)
    l_half2 = mdn.mdn_loss(raw, M, xy2, pen, half)
    np.testing.assert_allclose(np.asarray(l_half), np.asarray(l_half2), rtol=1e-6)
    assert not np.allclose(np.asarray(l_full), np.asarray(l_half))


def test_sample_greedy_picks_dominant_component():
    M = 2
    raw = np.zeros((1, 6 * M + 3), np.float32)
    raw[0, 0] = 5.0    # component 0 dominates
    raw[0, 2] = 1.5    # mu_x[0]
    raw[0, 4] = -2.5   # mu_y[0]
    raw[0, 6 * M] = 4.0  # pen logit 0 dominates
    params = mdn.split_params(jnp.asarray(raw), M)
    xy, pen = mdn.sample(params, jax.random.PRNGKey(0), greedy=True)
    np.testing.assert_allclose(np.asarray(xy)[0], [1.5, -2.5], atol=1e-6)
    assert int(pen[0]) == 0


def test_sample_stochastic_statistics():
    M = 1
    raw = np.zeros((2000, 6 * M + 3), np.float32)
    raw[:, 1] = 2.0    # mu_x
    raw[:, 2] = -1.0   # mu_y
    raw[:, 3:5] = np.log(0.5)  # sigmas
    params = mdn.split_params(jnp.asarray(raw), M)
    xy, _ = mdn.sample(params, jax.random.PRNGKey(0), temperature=1.0)
    xy = np.asarray(xy)
    np.testing.assert_allclose(xy.mean(0), [2.0, -1.0], atol=0.1)
    np.testing.assert_allclose(xy.std(0), 0.5, atol=0.1)


def test_low_temperature_concentrates():
    M = 1
    raw = np.zeros((500, 6 * M + 3), np.float32)
    raw[:, 3:5] = np.log(1.0)
    params = mdn.split_params(jnp.asarray(raw), M)
    hot, _ = mdn.sample(params, jax.random.PRNGKey(1), temperature=1.0)
    cold, _ = mdn.sample(params, jax.random.PRNGKey(1), temperature=0.01)
    assert np.asarray(cold).std() < np.asarray(hot).std() / 3
