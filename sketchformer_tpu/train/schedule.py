"""LR schedules: Noam warmup (reference: models/sketchformer.py
``CustomSchedule`` — lr = d_model^-0.5 * min(step^-0.5, step*warmup^-1.5))."""

from __future__ import annotations

import jax.numpy as jnp
import optax


def noam_schedule(d_model: int, warmup_steps: int = 4000, peak_scale: float = 1.0):
    def schedule(step):
        step = jnp.maximum(step.astype(jnp.float32), 1.0)
        return peak_scale * d_model ** -0.5 * jnp.minimum(
            step ** -0.5, step * warmup_steps ** -1.5
        )

    return schedule


def make_optimizer(
    d_model: int,
    warmup_steps: int = 4000,
    peak_scale: float = 1.0,
    beta1: float = 0.9,
    beta2: float = 0.98,
    eps: float = 1e-9,
    clip_norm: float = 1.0,
) -> optax.GradientTransformation:
    """Adam with Noam warmup + global-norm clipping (reference optimizer)."""
    return optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.adam(
            learning_rate=noam_schedule(d_model, warmup_steps, peak_scale),
            b1=beta1, b2=beta2, eps=eps,
        ),
    )
