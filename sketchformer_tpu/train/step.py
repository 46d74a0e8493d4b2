"""jit-compiled train/eval steps with donated state and mesh shardings.

Capability parity with the reference's ``train_on_batch`` (reference:
core/models.py + models/sketchformer.py — tf.function fwd/bwd + Adam apply),
re-designed TPU-first:

- one compiled step per (mode, bucket shape); state buffers are DONATED so
  params/opt-state update in place in HBM;
- the step is built against an optional ``jax.sharding.Mesh``: batch sharded
  over the ``data`` axis, params replicated (or sharded over ``model`` via
  the rules in :mod:`sketchformer_tpu.parallel.sharding`); XLA inserts the
  gradient all-reduce over ICI;
- optional gradient remat of the trunk for memory-bound configs.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax.core import FrozenDict

from sketchformer_tpu.models.sketchformer import Sketchformer
from sketchformer_tpu.train import loss as losses


class TrainState:
    """Minimal pytree train state (params, opt_state, step, rng)."""

    def __init__(self, params, opt_state, step, rng):
        self.params = params
        self.opt_state = opt_state
        self.step = step
        self.rng = rng

    def tree_flatten(self):
        return (self.params, self.opt_state, self.step, self.rng), None

    @classmethod
    def tree_unflatten(cls, _, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    TrainState, TrainState.tree_flatten, TrainState.tree_unflatten
)


def create_train_state(
    model: Sketchformer,
    tx: optax.GradientTransformation,
    rng: jax.Array,
    sample_batch: Dict[str, Any],
) -> TrainState:
    cfg = model.config
    init_rng, state_rng = jax.random.split(rng)
    kwargs = _model_kwargs(cfg, sample_batch)
    params = model.init({"params": init_rng, "dropout": init_rng}, **kwargs)[
        "params"
    ]
    opt_state = tx.init(params)
    return TrainState(params, opt_state, jnp.zeros((), jnp.int32), state_rng)


def _model_kwargs(cfg, batch) -> Dict[str, Any]:
    kwargs = {"enc": batch["enc"], "dec_in": batch["dec_in"]}
    if cfg.use_continuous:
        kwargs["enc_mask"] = batch["enc_mask"]
        kwargs["dec_key_mask"] = batch["dec_mask"]
    return kwargs


def _loss_fn(cfg, w_recon, w_cls):
    if cfg.use_continuous:
        return functools.partial(
            losses.cont_multitask_loss,
            num_mixtures=cfg.num_mixtures,
            w_recon=w_recon, w_cls=w_cls)
    return functools.partial(
        losses.tok_multitask_loss, w_recon=w_recon, w_cls=w_cls)


def make_train_step(
    model: Sketchformer,
    tx: optax.GradientTransformation,
    w_recon: float = 1.0,
    w_cls: float = 1.0,
    mesh: Optional[jax.sharding.Mesh] = None,
    remat: bool = False,
) -> Callable[[TrainState, Dict[str, Any]], Tuple[TrainState, Dict[str, Any]]]:
    cfg = model.config
    loss_fn = _loss_fn(cfg, w_recon, w_cls)

    apply = model.apply
    if remat:
        apply = jax.checkpoint(apply, static_argnums=())

    def step(state: TrainState, batch: Dict[str, Any]):
        step_rng = jax.random.fold_in(state.rng, state.step)

        def compute_loss(params):
            outputs = apply(
                {"params": params},
                **_model_kwargs(cfg, batch),
                deterministic=False,
                rngs={"dropout": step_rng},
            )
            return loss_fn(outputs, batch)

        (_, metrics), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(new_params, new_opt, state.step + 1, state.rng)
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    if mesh is not None:
        from sketchformer_tpu.parallel.sharding import shard_train_step

        return shard_train_step(step, mesh)
    return jax.jit(step, donate_argnums=(0,))


def make_eval_step(
    model: Sketchformer,
    w_recon: float = 1.0,
    w_cls: float = 1.0,
    mesh: Optional[jax.sharding.Mesh] = None,
):
    cfg = model.config
    loss_fn = _loss_fn(cfg, w_recon, w_cls)

    def step(params, batch):
        outputs = model.apply(
            {"params": params}, **_model_kwargs(cfg, batch),
            deterministic=True)
        _, metrics = loss_fn(outputs, batch)
        return metrics

    if mesh is not None:
        from sketchformer_tpu.parallel.sharding import shard_eval_step

        return shard_eval_step(step, mesh)
    return jax.jit(step)
