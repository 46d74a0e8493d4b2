"""Mixture-Density-Network (bivariate GMM + pen categorical) math.

The continuous Sketchformer variant emits the SketchRNN output
parameterization (reference: models/sketchformer.py MDN head + loss;
paper appendix / sketch-rnn): per step, M mixture components over
(dx, dy) — each a correlated bivariate Gaussian — plus a 3-way pen-state
categorical (down / lift / end).

Numerics (SURVEY.md "hard parts"): everything here runs in float32 even when
the trunk is bf16; the NLL uses log-sum-exp over component log-densities with
clamped log-sigma and bounded rho. Oracle-tested against a numpy
implementation in tests/test_mdn.py.

Parameter layout of a raw head output (``6*M + 3`` features)::

    [pi_logits(M) | mu_x(M) | mu_y(M) | log_sigma_x(M) | log_sigma_y(M)
     | rho_raw(M) | pen_logits(3)]
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

LOG_SIGMA_MIN = -6.0
LOG_SIGMA_MAX = 4.0
RHO_MAX = 0.99


class MDNParams(NamedTuple):
    log_pi: jnp.ndarray      # (..., M) log mixture weights (normalized)
    mu: jnp.ndarray          # (..., M, 2)
    log_sigma: jnp.ndarray   # (..., M, 2) clamped
    rho: jnp.ndarray         # (..., M) in (-RHO_MAX, RHO_MAX)
    pen_logits: jnp.ndarray  # (..., 3)


def split_params(raw: jnp.ndarray, num_mixtures: int) -> MDNParams:
    raw = raw.astype(jnp.float32)
    M = num_mixtures
    if raw.shape[-1] != 6 * M + 3:
        raise ValueError(f"expected {6 * M + 3} features, got {raw.shape[-1]}")
    pi_logits = raw[..., 0:M]
    mu = jnp.stack([raw[..., M : 2 * M], raw[..., 2 * M : 3 * M]], axis=-1)
    log_sigma = jnp.stack(
        [raw[..., 3 * M : 4 * M], raw[..., 4 * M : 5 * M]], axis=-1
    )
    log_sigma = jnp.clip(log_sigma, LOG_SIGMA_MIN, LOG_SIGMA_MAX)
    rho = RHO_MAX * jnp.tanh(raw[..., 5 * M : 6 * M])
    pen_logits = raw[..., 6 * M :]
    return MDNParams(
        log_pi=jax.nn.log_softmax(pi_logits, axis=-1),
        mu=mu,
        log_sigma=log_sigma,
        rho=rho,
        pen_logits=pen_logits,
    )


def component_log_prob(
    params: MDNParams, xy: jnp.ndarray
) -> jnp.ndarray:
    """Log N_m(xy) for every mixture component; xy (..., 2) -> (..., M)."""
    xy = xy.astype(jnp.float32)[..., None, :]           # (..., 1, 2)
    norm = (xy - params.mu) * jnp.exp(-params.log_sigma)  # (dx/sx, dy/sy)
    nx, ny = norm[..., 0], norm[..., 1]
    one_m_rho2 = jnp.maximum(1.0 - params.rho**2, 1e-6)
    zq = nx * nx + ny * ny - 2.0 * params.rho * nx * ny
    log_det = params.log_sigma.sum(axis=-1)
    return (
        -zq / (2.0 * one_m_rho2)
        - log_det
        - 0.5 * jnp.log(one_m_rho2)
        - jnp.log(2.0 * jnp.pi)
    )


def gmm_log_likelihood(params: MDNParams, xy: jnp.ndarray) -> jnp.ndarray:
    """Log p(xy) under the mixture; (..., 2) -> (...)."""
    return jax.nn.logsumexp(
        params.log_pi + component_log_prob(params, xy), axis=-1
    )


def mdn_loss(
    raw: jnp.ndarray,
    num_mixtures: int,
    tgt_xy: jnp.ndarray,
    tgt_pen: jnp.ndarray,
    mask: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Masked mean (GMM NLL, pen CE) over the batch.

    raw (B, T, 6M+3); tgt_xy (B, T, 2); tgt_pen (B, T) int; mask (B, T).
    """
    params = split_params(raw, num_mixtures)
    mask = mask.astype(jnp.float32)
    denom = jnp.maximum(mask.sum(), 1.0)
    nll_xy = -gmm_log_likelihood(params, tgt_xy)
    pen_ll = jax.nn.log_softmax(params.pen_logits, axis=-1)
    nll_pen = -jnp.take_along_axis(pen_ll, tgt_pen[..., None], axis=-1)[..., 0]
    return (nll_xy * mask).sum() / denom, (nll_pen * mask).sum() / denom


def sample(
    params: MDNParams,
    rng: jax.Array,
    temperature: float = 1.0,
    greedy: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Draw ((..., 2) xy, (...) pen-class) from the mixture.

    ``greedy`` takes the argmax component's mean and argmax pen state
    (deterministic reconstruction, the reference notebook's default decode).
    """
    k_pi, k_xy, k_pen = jax.random.split(rng, 3)
    if greedy:
        comp = jnp.argmax(params.log_pi, axis=-1)
        pen = jnp.argmax(params.pen_logits, axis=-1)
        mu = jnp.take_along_axis(
            params.mu, comp[..., None, None], axis=-2
        )[..., 0, :]
        return mu, pen
    t = jnp.maximum(temperature, 1e-6)
    comp = jax.random.categorical(k_pi, params.log_pi / t, axis=-1)
    idx2 = comp[..., None, None]  # (..., 1, 1) for (..., M, 2) arrays
    mu = jnp.take_along_axis(params.mu, idx2, axis=-2)[..., 0, :]
    log_sigma = jnp.take_along_axis(params.log_sigma, idx2, axis=-2)[..., 0, :]
    rho = jnp.take_along_axis(params.rho, comp[..., None], axis=-1)[..., 0]
    sigma = jnp.exp(log_sigma) * jnp.sqrt(t)
    eps = jax.random.normal(k_xy, mu.shape, dtype=jnp.float32)
    dx = mu[..., 0] + sigma[..., 0] * eps[..., 0]
    dy = mu[..., 1] + sigma[..., 1] * (
        rho * eps[..., 0] + jnp.sqrt(jnp.maximum(1 - rho**2, 1e-6)) * eps[..., 1]
    )
    pen = jax.random.categorical(k_pen, params.pen_logits / t, axis=-1)
    return jnp.stack([dx, dy], axis=-1), pen
