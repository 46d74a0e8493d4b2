"""Async host->device input staging (threaded double-buffered prefetch).

The train loop's batch feed was synchronous: ``train_step(state, batch)``
with a host numpy ``batch`` puts the host->device transfer ON the step's
critical path. For the token flagship that costs ~2 ms/step; for cont2cont
it is catastrophic — the (B, T, 5) f32 rows + targets + masks are ~2.9 MB
at B=512/T=96, measured ~37 ms/step over the remote-PJRT link
(tools/profile_cont_train.py: cont fwd+bwd+opt is 35 ms device time but
the numpy-fed production step clocked 72 ms). The reference never had
this problem only because its TF input pipeline prefetches to device
implicitly (SURVEY.md §2 distributed-stroke3 loader: tf.data
``prefetch``).

:func:`device_prefetch` is the TPU-native equivalent. On this runtime
``jax.device_put`` BLOCKS the issuing thread until the copy lands (remote
PJRT), so staging from the consumer thread cannot overlap — a worker
thread does the ``device_put`` instead, feeding a bounded queue. The
consumer pops device-resident batches; the worker's blocking copy runs
concurrently with the dispatched step. Measured: cont train 72 -> ~36 ms
per step (7.1k -> 14k sk/s).
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Dict, Iterable, Iterator, Optional

import jax

_STOP = object()


def device_prefetch(
    batches: Iterable[Dict[str, Any]],
    mesh: Optional[jax.sharding.Mesh] = None,
    depth: int = 2,
    stacked: bool = False,
    host_identical: bool = False,
) -> Iterator[Dict[str, Any]]:
    """Yield device-resident batches, staging up to ``depth`` ahead.

    ``batches`` yields host (numpy) pytrees; order is preserved. With a
    mesh, batches are placed directly into their ``data``-axis sharding
    (parallel.sharding.shard_batch); ``stacked`` marks steps_per_call
    batches whose leading axis is the (replicated) step axis. ``depth=2`` (double buffering) hides
    the copy behind any step longer than it; deeper pipelines only add
    HBM pressure. ``depth=0`` disables staging (synchronous passthrough)
    for debugging.

    The worker thread is a daemon and also exits when this generator is
    garbage-collected or closed (the bounded queue is drained with a
    sentinel handshake), so abandoning the iterator mid-stream leaks
    nothing.
    """
    if depth <= 0:
        yield from batches
        return

    if mesh is not None:
        from sketchformer_tpu.parallel.sharding import shard_batch

        def ship(b):
            # host_identical: eval feeds where every process already holds
            # the full batch (multi-process meshes slice instead of concat)
            return shard_batch(b, mesh, stacked=stacked,
                               host_identical=host_identical)
    else:

        def ship(b):
            return jax.tree.map(jax.device_put, b)

    q: queue.Queue = queue.Queue(maxsize=depth)
    stop = threading.Event()
    err: list = []

    def worker():
        try:
            for b in batches:
                staged = ship(b)
                while not stop.is_set():
                    try:
                        q.put(staged, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as e:  # surfaced to the consumer
            err.append(e)
        finally:
            while not stop.is_set():
                try:
                    q.put(_STOP, timeout=0.1)
                    return
                except queue.Full:
                    continue

    t = threading.Thread(target=worker, daemon=True,
                         name="device-prefetch")
    t.start()
    try:
        while True:
            item = q.get()
            if item is _STOP:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        stop.set()
