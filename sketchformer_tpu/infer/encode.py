"""Embedding extraction: sketches -> fixed-length bottleneck vectors.

Capability parity with the reference's ``model.encode`` usage in the
notebook / eval scripts (reference: basic_usage.ipynb + embedding-dump
script — tokenize+pad on host, encoder+bottleneck on device, dump z).

TPU-first: the jitted embed function compiles once per bucket shape and is
the throughput path for the north-star "sketches/sec/chip (encode)" metric;
``preprocess_on_device`` provides the vectorized on-device normalize +
delta-encode transform for continuous inputs (the tokenized path's
per-point math lives host-side in the tokenizer because SEP insertion is
ragged — see data/tokenizer.py).
"""

from __future__ import annotations

from typing import Callable, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sketchformer_tpu.models.sketchformer import Sketchformer


def preprocess_on_device(
    raw: jnp.ndarray,   # (B, T, 3) absolute-coordinate rows (x, y, pen)
    scale: float,
) -> jnp.ndarray:
    """Vectorized on-device transform: absolute points -> normalized
    stroke-3 deltas. Runs fused with the encoder under jit."""
    coords = raw[..., :2]
    deltas = jnp.diff(
        jnp.concatenate([jnp.zeros_like(coords[:, :1]), coords], axis=1),
        axis=1)
    return jnp.concatenate(
        [deltas / scale, raw[..., 2:]], axis=-1)


def make_embed_fn(model: Sketchformer, fast: bool = True) -> Callable:
    """Returns jitted ``embed(params, enc, enc_mask=None) -> (B, lowerdim)``.

    ``fast=True`` (default) routes supported configs through the fused
    encoder-stack kernel (infer/fast_encode.py — ~2x the composed path on
    v5e); unsupported configs fall back to ``model.apply`` inside
    ``fast_embed`` itself, so this is always safe. ``fast=False`` forces
    the composed flax path (the equivalence-test oracle).
    """
    if fast:
        from sketchformer_tpu.infer.fast_encode import fast_embed

        def embed(params, enc, enc_mask=None):
            return fast_embed(model, params, enc, enc_mask)
    else:
        def embed(params, enc, enc_mask=None):
            return model.apply(
                {"params": params}, enc, enc_mask, method=Sketchformer.embed)

    return jax.jit(embed)


def interpolate(za: np.ndarray, zb: np.ndarray, steps: int = 8) -> np.ndarray:
    """Linear interpolation path between two bottleneck embeddings.

    (The paper demonstrates latent-space sketch interpolation; decode the
    returned (steps, lowerdim) array with infer.decode.make_*_decoder_from_z.)
    """
    alphas = np.linspace(0.0, 1.0, steps, dtype=np.float32)[:, None]
    return (1.0 - alphas) * za[None] + alphas * zb[None]


def embed_dataset(
    model: Sketchformer,
    params,
    batches: Iterable[dict],
) -> Tuple[np.ndarray, np.ndarray]:
    """Run embedding extraction over batch dicts; returns (Z, labels).

    Rows flagged unreal by ``batch["is_real"]`` (repeat-padded duplicates
    that exist only to fill the static batch shape) are dropped, so the
    returned gallery never double-counts a sketch.

    Inputs are staged to the device asynchronously (data/prefetch.py) so
    the host->device copy of batch N+1 overlaps batch N's encode — on the
    remote-PJRT link the synchronous upload otherwise serializes with
    both the encode and the z fetch. label/is_real stay host-side (they
    are only consumed as numpy).

    Readback is PIPELINED too: ``np.asarray(z)`` right after the dispatch
    would block the host on the remote link's round-trip before batch
    N+1 could even be issued — measured 500 ms/batch end-to-end against
    a 12.7 ms encode (4.1k sk/s over a 98k gallery). Instead the z
    arrays ride a small in-flight queue (readback started eagerly where
    the backend supports it) and are materialized two batches behind, so
    device compute, D2H streaming, and the host pipeline overlap."""
    from collections import deque

    from sketchformer_tpu.data.prefetch import device_prefetch

    embed = make_embed_fn(model)
    cont = model.config.use_continuous
    # host parts ride a deque the prefetch worker appends to BEFORE
    # yielding the matching device part (deque ops are thread-safe, the
    # worker stays <= depth+1 ahead, and device_prefetch preserves order)
    host_parts: deque = deque()

    def device_part():
        for b in batches:
            host_parts.append(
                (np.asarray(b["label"]), b.get("is_real")))
            d = {"enc": b["enc"]}
            if cont:
                d["enc_mask"] = b["enc_mask"]
            yield d

    zs, labels = [], []
    inflight: deque = deque()    # (z on device, label, is_real)

    def drain_one():
        z_dev, lab, is_real = inflight.popleft()
        z = np.asarray(z_dev)
        if is_real is not None:
            keep = np.asarray(is_real) > 0.5
            z, lab = z[keep], lab[keep]
        zs.append(z)
        labels.append(lab)

    for dev in device_prefetch(device_part(), depth=2):
        lab, is_real = host_parts.popleft()
        if cont:
            z = embed(params, dev["enc"], dev["enc_mask"])
        else:
            z = embed(params, dev["enc"])
        try:
            z.copy_to_host_async()
        except AttributeError:   # non-jax array (interpret/test fakes)
            pass
        inflight.append((z, lab, is_real))
        if len(inflight) >= 3:
            drain_one()
    while inflight:
        drain_one()
    return np.concatenate(zs, axis=0), np.concatenate(labels, axis=0)
