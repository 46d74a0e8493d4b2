"""Packed wire-format batches: ship only what the device can't derive.

A full cont2cont train batch at B=512/T=96 is ~2.9 MB
(enc rows + shifted dec_in + tgt_xy + tgt_pen + two float masks), but
everything except the stroke rows, per-sketch lengths, and labels is a
pure function of those three — shipping the rest is wasted host->device
bandwidth (~37 ms/step over this remote-PJRT link, tools/
profile_cont_train.py; the copy serializes with compute, so prefetch
alone cannot hide it). Token batches likewise ship ``dec_in``/``dec_tgt``
that are shifts/aliases of ``enc``.

:func:`pack_batch` reduces a pipeline batch (data/pipeline.py
``make_batch_tok`` / ``make_batch_cont`` output) to its wire payload —
cont 2.9 MB -> 0.6 MB, token 0.59 MB -> 0.20 MB — and
:func:`unpack_batch` reconstructs the full batch with jnp ops, traced
INSIDE the jitted train/eval step so expansion costs device-side
elementwise work instead of wire bytes. Reconstruction is bit-exact
(tests/test_pipeline.py pins pack->unpack == builder output for both
modes, python and native builders).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from sketchformer_tpu.data.tokenizer import SOS_ID

PEN_END = 2
_SOS_ROW = (0.0, 0.0, 0.0, 1.0, 0.0)  # pipeline.SOS_ROW: "pen just lifted"

# keys that mark an already-expanded batch
_FULL_KEYS = ("dec_in",)


def is_packed(batch: Dict[str, Any]) -> bool:
    return "dec_in" not in batch


def pack_batch(batch: Dict[str, Any]) -> Dict[str, Any]:
    """Full pipeline batch -> minimal wire dict (host-side, zero-copy
    where possible). Already-packed batches pass through."""
    if is_packed(batch):
        return batch
    wire = {"enc": batch["enc"], "label": batch["label"]}
    if "is_real" in batch:
        wire["is_real"] = batch["is_real"]
    if "enc_mask" in batch:  # cont mode: rows (B, T, C)
        # n real rows per sketch == enc_mask row sum (builder reserves the
        # n-th position for the END target, so dec_mask = n+1 ones)
        wire["n"] = np.asarray(
            batch["enc_mask"]).sum(axis=-1).astype(np.int32)
    return wire


def unpack_batch(batch: Dict[str, Any]) -> Dict[str, Any]:
    """Wire dict -> full batch (jnp ops; call inside jit). Exact mirror of
    data/pipeline.py make_batch_tok (:99-107) / make_batch_cont (:131-161)."""
    if not is_packed(batch):
        return batch
    enc = batch["enc"]
    out = dict(batch)
    if "n" not in batch:  # token ids: shift right, SOS first; PAD carries
        out["dec_in"] = jnp.concatenate(
            [jnp.full_like(enc[:, :1], SOS_ID), enc[:, :-1]], axis=1)
        out["dec_tgt"] = enc
        return out
    # cont mode: enc (B, T, C) rows, n (B,) real-row counts
    n = batch["n"]
    T = enc.shape[1]
    pos = jnp.arange(T, dtype=jnp.int32)[None, :]
    real = pos < n[:, None]
    enc_mask = real.astype(jnp.float32)
    dec_mask = (pos < (n + 1)[:, None]).astype(jnp.float32)
    tgt_xy = enc[..., :2].astype(jnp.float32)
    tgt_pen = jnp.where(real, (enc[..., 2] >= 0.5).astype(jnp.int32), PEN_END)
    pen_oh = jax.nn.one_hot(tgt_pen[:, :-1], 3, dtype=jnp.float32)
    # builder zeroes the one-hot on rows past the END target so padding
    # stays all-zero (pipeline.py:151)
    pen_oh = pen_oh * dec_mask[:, :-1, None]
    sos = jnp.broadcast_to(
        jnp.asarray(_SOS_ROW, jnp.float32), (enc.shape[0], 1, 5))
    dec_in = jnp.concatenate(
        [sos,
         jnp.concatenate([tgt_xy[:, :-1], pen_oh], axis=-1)], axis=1)
    out.pop("n")
    out.update(enc_mask=enc_mask, dec_mask=dec_mask, tgt_xy=tgt_xy,
               tgt_pen=tgt_pen, dec_in=dec_in)
    return out
