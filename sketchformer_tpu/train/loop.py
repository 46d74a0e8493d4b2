"""The experiment driver: train loop with eval, checkpointing, notification.

Capability parity with the reference's BaseModel.train() (reference:
core/models.py — step loop over the dataloader with periodic validation
metrics, checkpoint saves, TensorBoard scalars, Slack notification, resume
from experiment dir). TPU-first deltas:

- the loop only touches the device through the ONE jitted train step per
  bucket shape (batches stream host->device asynchronously; metrics are
  fetched with a 1-step lag so the device never idles on host logging);
- checkpointing is async orbax (see train/checkpoint.py) with auto-resume;
- reconstruction-grid plot metrics run the KV-cached decoder, not a
  re-scoring loop.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Optional

import jax

from sketchformer_tpu.models.sketchformer import Sketchformer
from sketchformer_tpu.train.checkpoint import CheckpointManager
from sketchformer_tpu.train.schedule import make_optimizer
from sketchformer_tpu.train.step import (
    create_train_state,
    make_eval_step,
    make_train_step,
)
from sketchformer_tpu.utils.metrics import MetricWriter, StepTimer
from sketchformer_tpu.utils.notify import Notifier, NullNotifier


@dataclasses.dataclass
class TrainLoopConfig:
    total_steps: int = 10_000
    eval_every: int = 500
    save_every: int = 1000
    notify_every: int = 1000
    log_every: int = 50
    warmup_steps: int = 4000
    peak_scale: float = 1.0
    w_recon: float = 1.0
    w_cls: float = 1.0
    seed: int = 0
    resume: bool = True
    remat: bool = False
    accum_steps: int = 1
    # K optimizer steps per device dispatch (lax.scan in the compiled step;
    # ~1 ms/step measured win on remote-PJRT v5e — docs/PERF_TRAIN.md).
    # Batches are buffered per bucket shape until K accumulate; cadences
    # (log/eval/save/notify) fire on boundary crossings, so they need not
    # divide by K.
    steps_per_call: int = 1
    # async host->device batch staging depth (data/prefetch.py); 0 =
    # synchronous feed. 2 hides the copy behind any step longer than it.
    device_prefetch: int = 2
    profile_steps: int = 0      # trace steps [10, 10+N) with jax.profiler
    recon_grid_every: int = 0   # decode+render a val recon grid every N steps
    # registered val metrics (train/val_metrics.py), comma-separated names
    # e.g. "recon_grid,interpolation_grid,retrieval"; run every metrics_every
    # steps (0 -> at eval_every cadence)
    metrics: str = ""
    metrics_every: int = 0
    # rbg dropout masks measured 28% faster steps than threefry on v5e.
    # Keep one impl per run dir: the rng key is checkpointed and its
    # representation differs across impls.
    prng_impl: str = "rbg"


def run_training(
    model: Sketchformer,
    loader,
    run_dir: str,
    loop_cfg: Optional[TrainLoopConfig] = None,
    mesh=None,
    notifier: Optional[Notifier] = None,
    max_eval_batches: int = 8,
) -> Dict[str, float]:
    """Train to ``total_steps``; returns final eval metrics.

    The PRNG impl (``loop_cfg.prng_impl``) is applied as a scoped global:
    raw uint32 keys carry no impl tag, so the choice must be process-global
    while keys are created/used — it is restored on exit so surrounding
    code (and in-process tests) keep their impl.
    """
    import contextlib

    loop_cfg = loop_cfg or TrainLoopConfig()

    @contextlib.contextmanager
    def scoped_prng():
        old = jax.config.jax_default_prng_impl
        jax.config.update("jax_default_prng_impl", loop_cfg.prng_impl)
        try:
            yield
        finally:
            jax.config.update("jax_default_prng_impl", old)

    with scoped_prng():
        return _run_training(
            model, loader, run_dir, loop_cfg, mesh, notifier,
            max_eval_batches)


def _run_training(
    model: Sketchformer,
    loader,
    run_dir: str,
    loop_cfg: TrainLoopConfig,
    mesh=None,
    notifier: Optional[Notifier] = None,
    max_eval_batches: int = 8,
) -> Dict[str, float]:
    # Multi-process runs (jax.distributed initialized — real pods or the
    # localhost harness in parallel/multiprocess.py): every process drives
    # the SAME loop over the global mesh, but the run dir has exactly ONE
    # writer — process 0 owns metrics/config/notifications; checkpoint
    # saves stay collective (orbax coordinates the single on-disk write).
    is_main = jax.process_index() == 0
    notifier = (notifier or NullNotifier()) if is_main else NullNotifier()
    cfg = model.config

    tx = make_optimizer(
        cfg.d_model, warmup_steps=loop_cfg.warmup_steps,
        peak_scale=loop_cfg.peak_scale)
    K = max(loop_cfg.steps_per_call, 1)
    train_step = make_train_step(
        model, tx, w_recon=loop_cfg.w_recon, w_cls=loop_cfg.w_cls,
        mesh=mesh, remat=loop_cfg.remat, accum_steps=loop_cfg.accum_steps,
        steps_per_call=K)
    eval_step = make_eval_step(
        model, w_recon=loop_cfg.w_recon, w_cls=loop_cfg.w_cls, mesh=mesh)

    def batch_stream():
        epoch = 0
        while True:
            yield from loader.batch_iterator("train", epoch=epoch)
            epoch += 1

    from sketchformer_tpu.data.pipeline import Prefetcher

    stream = Prefetcher(batch_stream(), depth=4)
    first = next(stream)
    state = create_train_state(
        model, tx, jax.random.PRNGKey(loop_cfg.seed), first)

    if K > 1:
        # buffer per bucket shape until K same-shape batches accumulate,
        # then stack to the (K, B, ...) layout make_train_step scans over
        import numpy as np

        pending: Dict[tuple, list] = {}
        leftover = [first]

        from sketchformer_tpu.data.packed import pack_batch as _pack

        def next_call_batch():
            # pack BEFORE stacking: the wire format's length vector is
            # derived per elementary batch (data/packed.py)
            while True:
                b = leftover.pop() if leftover else next(stream)
                key = b["enc"].shape
                bs = pending.setdefault(key, [])
                bs.append(_pack(b))
                if len(bs) == K:
                    del pending[key]
                    return jax.tree.map(lambda *xs: np.stack(xs), *bs)
    else:
        leftover = [first]

        def next_call_batch():
            return leftover.pop() if leftover else next(stream)
    if mesh is not None:
        from sketchformer_tpu.parallel.sharding import shard_state

        state = shard_state(state, mesh)

    # async host->device staging: device_put the NEXT call's batch while
    # the current step runs (measured: cont steps 61 -> ~36 ms; the
    # transfer of a 2.9 MB cont batch otherwise sits on the critical
    # path — data/prefetch.py)
    from sketchformer_tpu.data.packed import pack_batch
    from sketchformer_tpu.data.prefetch import device_prefetch

    def _call_batches():
        # pack to the minimal wire format (data/packed.py): derived
        # tensors (dec_in/targets/masks) are reconstructed on device
        # inside the jitted step instead of shipped every step
        while True:
            yield pack_batch(next_call_batch())

    device_stream = device_prefetch(
        _call_batches(), mesh=mesh, depth=loop_cfg.device_prefetch,
        stacked=K > 1)

    ckpt = CheckpointManager(run_dir, save_interval_steps=loop_cfg.save_every)
    if is_main:
        ckpt.save_config(cfg)
        ckpt.save_meta({"prng_impl": loop_cfg.prng_impl})
    if loop_cfg.resume and ckpt.latest_step() is not None:
        state = ckpt.restore(state)
    current = {"state": state}
    ckpt.save_on_signal(lambda: current["state"])

    from sketchformer_tpu.utils.metrics import NullMetricWriter

    writer = MetricWriter(run_dir) if is_main else NullMetricWriter()
    timer = StepTimer()
    step_i = int(state.step)
    last_metrics: Dict[str, float] = {}
    last_eval_step = -1

    def run_eval() -> Dict[str, float]:
        batches = loader.get_validation_set(max_batches=max_eval_batches)
        acc: Dict[str, float] = {}
        # eval splits are read whole on EVERY process (loader policy), so
        # on a multi-process mesh the feed is host-identical: each process
        # contributes its row slice instead of duplicating the batch
        for b in device_prefetch(batches, mesh=mesh, depth=2,
                                 host_identical=True):
            m = eval_step(current["state"].params, b)
            for k, v in m.items():
                acc[k] = acc.get(k, 0.0) + float(v)
        return {f"val_{k}": v / max(len(batches), 1) for k, v in acc.items()}

    # -- registered val metrics (reference: core/metrics.py registry) ------
    from sketchformer_tpu.train.val_metrics import MetricContext, build_metrics

    metric_names = loop_cfg.metrics
    if loop_cfg.recon_grid_every and "recon_grid" not in metric_names:
        # back-compat: recon_grid_every implies the registered grid metric
        metric_names = (metric_names + ",recon_grid").strip(",")
    registered = build_metrics(metric_names)
    metric_ctx = MetricContext(
        model=model, params=None, loader=loader, step=0,
        rng_seed=loop_cfg.seed)
    metrics_every = (
        loop_cfg.recon_grid_every or loop_cfg.metrics_every
        or loop_cfg.eval_every)

    def run_registered_metrics(step):
        # plot/retrieval metrics are main-process work: they decode and
        # render on the host. Under multi-process, hand main a host copy
        # of the (replicated) params so its local jits don't mix global
        # arrays with local computations.
        if not is_main:
            return
        params = current["state"].params
        if jax.process_count() > 1:
            import numpy as np

            def _host_copy(x):
                # fully-replicated leaves read out directly; TP-sharded
                # leaves span non-addressable devices and must be
                # replicated first (ADVICE r4) — an identity jit with a
                # replicated out-sharding is the all-gather
                if getattr(x, "is_fully_replicated", True):
                    return np.asarray(x)
                from jax.sharding import NamedSharding, PartitionSpec

                rep = NamedSharding(x.sharding.mesh, PartitionSpec())
                return np.asarray(
                    jax.jit(lambda a: a, out_shardings=rep)(x))

            params = jax.tree.map(_host_copy, params)
        metric_ctx.params = params
        metric_ctx.step = step
        for m in registered:
            out = m.compute(metric_ctx)
            if m.kind == "image":
                writer.write_image(step, m.name, out)
                notifier.notify(f"{m.name} grid @ step {step}", image=out)
            else:
                writer.write_scalars(step, out)
                last_metrics.update(out)

    profiling = False
    start_step = step_i  # profile trigger is relative (resume-safe)

    def crossed(every: int) -> bool:
        # fires when [step_i-K, step_i] crossed a multiple of ``every``
        # (== ``step_i % every == 0`` at K=1)
        return (step_i // every) != ((step_i - K) // every)

    while step_i < loop_cfg.total_steps:
        if loop_cfg.profile_steps:
            if step_i >= start_step + 10 and not profiling:
                try:
                    jax.profiler.start_trace(
                        os.path.join(run_dir, "profile"))
                    profiling = True
                except Exception:
                    loop_cfg.profile_steps = 0
            elif profiling and step_i >= start_step + 10 + loop_cfg.profile_steps:
                jax.profiler.stop_trace()
                profiling = False
                loop_cfg.profile_steps = 0
        batch = next(device_stream)
        state, metrics = train_step(current["state"], batch)
        current["state"] = state
        step_i += K
        timer.tick(K)
        if crossed(loop_cfg.log_every) or step_i == K:
            host = {k: float(v) for k, v in metrics.items()}
            host["steps_per_sec"] = timer.steps_per_sec()
            if hasattr(loader, "truncation_stats"):
                seen, trunc = loader.truncation_stats()
                host["truncated_frac"] = trunc / max(seen, 1)
            writer.write_scalars(step_i, host)
            last_metrics = host
        if crossed(loop_cfg.eval_every):
            ev = run_eval()
            writer.write_scalars(step_i, ev)
            last_metrics.update(ev)
            last_eval_step = step_i
        if crossed(loop_cfg.notify_every):
            notifier.notify(f"step {step_i}", scalars=last_metrics)
        if registered and crossed(metrics_every):
            run_registered_metrics(step_i)
        if crossed(loop_cfg.save_every):
            # host-side gate BEFORE touching the manager: ckpt.save reads
            # int(state.step), which would force a device sync every step
            ckpt.save(state)

    if last_eval_step == step_i:
        # the cadence eval already ran at this exact step — reuse it
        # instead of recomputing and double-writing the same record
        final = {k: v for k, v in last_metrics.items()
                 if k.startswith("val_")}
    else:
        final = run_eval()
        writer.write_scalars(step_i, final)
    ckpt.save(current["state"], force=True)
    ckpt.wait_until_finished()
    writer.close()
    ckpt.close()
    stream.close()
    return final
