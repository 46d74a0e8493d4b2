"""GSPMD sharding rules: param partition specs + step wrappers.

TPU-native replacement for the (absent) distribution layer of the reference.
Strategy: annotate, let XLA insert collectives (the scaling-book recipe).

- batch tensors: ``P('data', ...)`` on the leading axis;
- weight tensors: tensor-parallel specs by parameter-path pattern —
  FFN in-proj column-sharded / out-proj row-sharded over ``model``,
  attention QKV head-axis sharded / out-proj head-axis sharded,
  embeddings + heads feature-sharded; everything else replicated.

With ``model_parallelism=1`` (the default — this model easily fits one chip)
every 'model' spec collapses to replication, so the same code path serves
pure-DP and DP+TP without branching.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _put(x, sharding: NamedSharding):
    """Place a host array into ``sharding``. Multi-process aware: when the
    mesh spans devices this process cannot address (real multi-host DP, or
    the 2-process localhost harness in parallel/multiprocess.py),
    ``jax.device_put`` cannot target them — build the global array from
    this process's addressable shards instead. ``x`` must hold the FULL
    (global) value, which is true for params/opt-state/scalars (identical
    on every process by construction: same init seed, same update)."""
    if sharding.is_fully_addressable:
        return jax.device_put(x, sharding)
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])


def _spec_for_param(path: Tuple[str, ...], leaf) -> P:
    """Partition spec from a parameter's module path + shape."""
    name = "/".join(path)
    ndim = leaf.ndim
    if "ffn/in/kernel" in name:
        return P(None, "model")
    if "ffn/out/kernel" in name:
        return P("model", None)
    if any(f"{k}/kernel" in name for k in ("query", "key", "value")) and ndim == 3:
        return P(None, "model", None)  # (d_model, heads, head_dim)
    if "out/kernel" in name and ndim == 3:
        return P("model", None, None)  # (heads, head_dim, d_model)
    if "embed/embedding" in name and ndim == 2:
        return P(None, "model")  # (vocab, d_model) feature-sharded
    return P(*([None] * ndim))


def _path_names(path) -> Tuple[str, ...]:
    out = []
    for p in path:
        if hasattr(p, "key"):
            out.append(str(p.key))
        elif hasattr(p, "name"):
            out.append(str(p.name))
        else:
            out.append(str(p))
    return tuple(out)


def get_param_specs(params) -> Any:
    """Pytree of PartitionSpec matching ``params``."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _spec_for_param(_path_names(path), leaf), params
    )


def shard_params(params, mesh: Mesh):
    specs = get_param_specs(params)
    return jax.tree.map(
        lambda x, s: _put(x, NamedSharding(mesh, s)), params, specs
    )


def shard_state(state, mesh: Mesh):
    """Place a TrainState on the mesh: params per rules, Adam moments (which
    mirror the param tree) with the same specs, everything else replicated."""
    from sketchformer_tpu.train.step import TrainState

    pspecs = get_param_specs(state.params)
    rep = NamedSharding(mesh, P())

    def put_like_params(subtree):
        return jax.tree.map(
            lambda x, s: _put(x, NamedSharding(mesh, s)),
            subtree, pspecs)

    def walk(node):
        if hasattr(node, "mu") and hasattr(node, "nu"):  # ScaleByAdamState
            return node._replace(
                count=_put(node.count, rep),
                mu=put_like_params(node.mu),
                nu=put_like_params(node.nu))
        if isinstance(node, tuple) and hasattr(node, "_fields"):
            return type(node)(*[walk(c) for c in node])
        if isinstance(node, (tuple, list)):
            return type(node)(walk(c) for c in node)
        return jax.tree.map(lambda x: _put(x, rep), node)

    return TrainState(
        shard_params(state.params, mesh),
        walk(state.opt_state),
        _put(state.step, rep),
        _put(state.rng, rep),
    )


def batch_spec(leaf, stacked: bool = False) -> P:
    """Partition spec for a batch leaf: batch axis over 'data'. With
    ``stacked`` (steps_per_call chunking) axis 0 is the step axis —
    replicated — and axis 1 is the batch axis."""
    if stacked:
        return P(None, "data", *([None] * (leaf.ndim - 2)))
    return P("data", *([None] * (leaf.ndim - 1)))


def shard_batch(batch: Dict[str, Any], mesh: Mesh,
                stacked: bool = False,
                host_identical: bool = False) -> Dict[str, Any]:
    """Place a host batch into its data-parallel sharding. ``stacked``:
    leaves carry a leading steps_per_call axis (replicated) before the
    batch axis — without it a stacked batch would be split over the STEP
    axis and resharded inside the jitted step.

    Multi-process meshes (mesh devices not all addressable): by default
    each process passes its LOCAL batch rows — its disjoint slice of the
    data stream (DistributedStroke3Loader process striding) — and the
    global batch is their concatenation in process order along the batch
    axis. ``host_identical=True`` is for feeds where every process holds
    the SAME full batch (eval splits are read whole on all hosts): each
    process contributes only its process_index-th row slice so the
    global array equals the original batch instead of P copies of it."""
    out = {}
    for k, v in batch.items():
        s = NamedSharding(mesh, batch_spec(v, stacked))
        if s.is_fully_addressable:
            out[k] = jax.device_put(v, s)
            continue
        if host_identical:
            axis = 1 if stacked else 0
            pi, pc = jax.process_index(), jax.process_count()
            n = v.shape[axis]
            if n % pc:
                raise ValueError(
                    f"host-identical batch axis {n} not divisible by "
                    f"process_count={pc}")
            step_n = n // pc
            # Guard the process-contiguity assumption (ADVICE r4): the
            # rows this process contributes must be exactly the rows the
            # sharding assigns to its addressable devices. make_mesh over
            # jax.devices() satisfies this; a caller-supplied device
            # order might not, and a silent permutation would assemble a
            # wrong global batch.
            local = [ix[axis]
                     for d, ix in s.devices_indices_map(v.shape).items()
                     if d.process_index == pi]
            lo = min(sl.start or 0 for sl in local)
            hi = max(n if sl.stop is None else sl.stop for sl in local)
            if (lo, hi) != (pi * step_n, (pi + 1) * step_n):
                raise ValueError(
                    "host_identical slicing requires the mesh data axis "
                    "to be process-contiguous in process-index order: "
                    f"process {pi} owns rows [{lo}, {hi}) but would "
                    f"contribute [{pi * step_n}, {(pi + 1) * step_n})")
            idx = [slice(None)] * v.ndim
            idx[axis] = slice(pi * step_n, (pi + 1) * step_n)
            v = v[tuple(idx)]
        out[k] = jax.make_array_from_process_local_data(s, np.asarray(v))
    return out


def constrain_batch(batch: Dict[str, Any], mesh: Mesh,
                    stacked: bool = False) -> Dict[str, Any]:
    return {
        k: jax.lax.with_sharding_constraint(
            v, NamedSharding(mesh, batch_spec(v, stacked)))
        for k, v in batch.items()
    }


def shard_train_step(step: Callable, mesh: Mesh,
                     stacked_batch: bool = False,
                     explicit_spmd: bool = False) -> Callable:
    """jit the step with batch constrained over 'data'; XLA propagates the
    param shardings from the input placement and inserts the ICI all-reduce
    for gradients. ``stacked_batch``: leaves carry a leading
    steps_per_call axis (replicated) before the batch axis.

    ``explicit_spmd`` instead wraps the step in ``jax.shard_map`` over the
    ``data`` axis (state replicated, batch sharded): every device runs the
    step body on its LOCAL batch shard, so a Pallas custom call inside the
    model can never attract an all-gather of the (B, T, d) activations —
    the round-2 GSPMD risk ("XLA may insert gathers around the custom
    call"). The step body must psum its grads/metrics itself — built
    by ``make_train_step(..., data_axis='data')`` (train/step.py), which
    also folds the device index into the dropout rng so shards draw
    independent masks. The ``model`` axis (if sized >1) stays in GSPMD
    auto mode — shard_map is applied to ``data`` only."""
    if not explicit_spmd:
        def wrapped(state, batch):
            batch = constrain_batch(batch, mesh, stacked_batch)
            return step(state, batch)

        return jax.jit(wrapped, donate_argnums=(0,))

    def bspec(leaf):
        return batch_spec(leaf, stacked_batch)

    def wrapped(state, batch):
        body = jax.shard_map(
            step,
            mesh=mesh,
            in_specs=(P(), jax.tree.map(bspec, batch)),
            out_specs=(P(), P()),
            axis_names={"data"},
            check_vma=False,
        )
        return body(state, batch)

    return jax.jit(wrapped, donate_argnums=(0,))


def shard_eval_step(step: Callable, mesh: Mesh) -> Callable:
    def wrapped(params, batch):
        batch = constrain_batch(batch, mesh)
        return step(params, batch)

    return jax.jit(wrapped)
