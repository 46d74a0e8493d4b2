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

from sketchformer_tpu.data.packed import unpack_batch
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
    kwargs = _model_kwargs(cfg, unpack_batch(sample_batch))
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
    accum_steps: int = 1,
    guard_nonfinite: bool = True,
    steps_per_call: int = 1,
    explicit_spmd: bool = False,
) -> Callable[[TrainState, Dict[str, Any]], Tuple[TrainState, Dict[str, Any]]]:
    """Build the jitted train step.

    ``explicit_spmd`` (requires ``mesh``) runs the step under
    ``jax.shard_map`` over the ``data`` axis instead of GSPMD sharding
    propagation: each device computes grads on its local batch shard, the
    step body pmeans grads/metrics over ``data``, and the dropout rng
    folds in the device index so shards draw independent masks. This
    guarantees Pallas custom calls inside the model never attract
    activation all-gathers (pinned by tests/test_parallel.py).

    ``accum_steps > 1`` enables microbatching: the batch's leading axis is
    split into that many slices and gradients are averaged in an on-device
    ``lax.scan`` before ONE optimizer update — the memory knob for
    larger-than-HBM effective batches (SURVEY.md §7 M3).

    ``steps_per_call > 1`` runs K FULL optimizer steps per device call via
    ``lax.scan``: the returned callable takes a batch dict whose leaves
    have a leading axis of K (one batch per step) and advances ``state.step``
    by K, returning metrics averaged over the K steps. This amortizes the
    per-step host dispatch (a few ms on a remote-PJRT chip) to ~0 — the
    standard production TPU loop shape. Orthogonal to ``accum_steps``.

    ``guard_nonfinite`` (default on) REJECTS any update whose global grad
    norm is non-finite: params and optimizer state are kept unchanged for
    that step (metrics gain ``skipped_nonfinite``). A single inf/nan step
    otherwise poisons Adam's moments permanently — observed as an
    unrecoverable divergence in an early bf16 pretraining run.
    """
    cfg = model.config
    loss_fn = _loss_fn(cfg, w_recon, w_cls)

    # token mode computes the reconstruction CE inside the model via the
    # chunked fused head (no full-vocab logits tensor); cont mode keeps the
    # MDN output path
    fused_ce = not cfg.use_continuous

    def grads_for(params, batch, step_rng):
        def fwd(p):
            if fused_ce:
                return model.apply(
                    {"params": p},
                    **_model_kwargs(cfg, batch),
                    dec_tgt=batch["dec_tgt"],
                    deterministic=False,
                    rngs={"dropout": step_rng},
                    row_weights=batch.get("is_real"),
                    method=Sketchformer.forward_tok_loss,
                )
            return model.apply(
                {"params": p},
                **_model_kwargs(cfg, batch),
                deterministic=False,
                rngs={"dropout": step_rng},
            )

        if remat:
            # remat over a params-only closure: batch/rng are captured
            # residuals; only array-valued inputs pass through checkpoint
            fwd = jax.checkpoint(fwd)

        def compute_loss(p):
            if fused_ce:
                return losses.tok_multitask_loss_fused(
                    fwd(p), batch, w_recon=w_recon, w_cls=w_cls)
            return loss_fn(fwd(p), batch)

        return jax.value_and_grad(compute_loss, has_aux=True)(params)

    data_axis = "data" if (explicit_spmd and mesh is not None) else None

    def step(state: TrainState, batch: Dict[str, Any]):
        # packed wire batches (data/packed.py) expand on device: the loop
        # ships only rows/lengths/labels, the derived dec_in/targets/masks
        # cost elementwise work here instead of host->device bandwidth
        batch = unpack_batch(batch)
        step_rng = jax.random.fold_in(state.rng, state.step)
        if data_axis is not None:
            # independent dropout masks per data shard (replicated rng
            # would repeat the same mask on every device's local batch)
            step_rng = jax.random.fold_in(
                step_rng, jax.lax.axis_index(data_axis))

        if accum_steps == 1:
            (_, metrics), grads = grads_for(state.params, batch, step_rng)
        else:
            micro = jax.tree.map(
                lambda x: x.reshape(
                    (accum_steps, x.shape[0] // accum_steps) + x.shape[1:]),
                batch)

            def body(carry, inputs):
                g_acc, m_acc, i = carry
                (_, m), g = grads_for(
                    state.params, inputs, jax.random.fold_in(step_rng, i))
                g_acc = jax.tree.map(jnp.add, g_acc, g)
                m_acc = jax.tree.map(jnp.add, m_acc, dict(m))
                return (g_acc, m_acc, i + 1), None

            # first microbatch seeds the accumulators (no shape probing)
            first_mb = jax.tree.map(lambda x: x[0], micro)
            rest = jax.tree.map(lambda x: x[1:], micro)
            (_, m0), g0 = grads_for(state.params, first_mb, step_rng)
            (grads, metrics, _), _ = jax.lax.scan(
                body, (g0, dict(m0), jnp.int32(1)), rest)
            inv = 1.0 / accum_steps
            grads = jax.tree.map(lambda g: g * inv, grads)
            metrics = jax.tree.map(lambda v: v * inv, metrics)

        if data_axis is not None:
            # explicit-SPMD: each shard computed grads on its local batch;
            # the cross-shard mean IS the global-batch gradient (equal
            # shard sizes). Metrics pmean'd the same way.
            grads = jax.lax.pmean(grads, data_axis)
            metrics = jax.lax.pmean(dict(metrics), data_axis)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics)
        grad_norm = optax.global_norm(grads)
        metrics["grad_norm"] = grad_norm
        if guard_nonfinite:
            ok = jnp.isfinite(grad_norm)
            keep = lambda new, old: jax.tree.map(
                lambda n, o: jnp.where(ok, n, o), new, old)
            new_params = keep(new_params, state.params)
            new_opt = keep(new_opt, state.opt_state)
            metrics["skipped_nonfinite"] = 1.0 - ok.astype(jnp.float32)
        new_state = TrainState(new_params, new_opt, state.step + 1, state.rng)
        return new_state, metrics

    if steps_per_call > 1:
        def chunked(state: TrainState, batches: Dict[str, Any]):
            def body(st, one):
                return step(st, one)
            state, metrics = jax.lax.scan(body, state, batches)
            return state, jax.tree.map(
                lambda v: v.mean(axis=0), metrics)
        step_fn = chunked
    else:
        step_fn = step

    if mesh is not None:
        from sketchformer_tpu.parallel.sharding import shard_train_step

        return shard_train_step(step_fn, mesh,
                                stacked_batch=steps_per_call > 1,
                                explicit_spmd=explicit_spmd)
    return jax.jit(step_fn, donate_argnums=(0,))


def make_eval_step(
    model: Sketchformer,
    w_recon: float = 1.0,
    w_cls: float = 1.0,
    mesh: Optional[jax.sharding.Mesh] = None,
):
    cfg = model.config
    loss_fn = _loss_fn(cfg, w_recon, w_cls)
    fused_ce = not cfg.use_continuous

    def step(params, batch):
        batch = unpack_batch(batch)
        if fused_ce:
            outputs = model.apply(
                {"params": params}, **_model_kwargs(cfg, batch),
                dec_tgt=batch["dec_tgt"], deterministic=True,
                row_weights=batch.get("is_real"),
                method=Sketchformer.forward_tok_loss)
            _, metrics = losses.tok_multitask_loss_fused(
                outputs, batch, w_recon=w_recon, w_cls=w_cls)
            return metrics
        outputs = model.apply(
            {"params": params}, **_model_kwargs(cfg, batch),
            deterministic=True)
        _, metrics = loss_fn(outputs, batch)
        return metrics

    if mesh is not None:
        from sketchformer_tpu.parallel.sharding import shard_eval_step

        return shard_eval_step(step, mesh)
    return jax.jit(step)
