"""Multi-task losses: reconstruction (token CE | GMM-NLL + pen CE) + cls CE.

Capability parity with the reference's loss assembly (reference:
models/sketchformer.py — weighted sum of reconstruction loss over non-pad
positions and classification cross-entropy on the bottleneck).

All losses computed in f32 on f32 head outputs.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from sketchformer_tpu.data.tokenizer import PAD_ID
from sketchformer_tpu.ops import mdn


def token_reconstruction_loss(
    logits: jnp.ndarray, targets: jnp.ndarray, pad_id: int = PAD_ID,
    row_weights: jnp.ndarray = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Masked mean CE and accuracy over non-pad target positions.

    ``row_weights`` (B,) optionally zeroes whole rows — used by eval to
    exclude repeat-padded duplicate sketches (batch["is_real"])."""
    logits = logits.astype(jnp.float32)
    mask = (targets != pad_id).astype(jnp.float32)
    if row_weights is not None:
        mask = mask * row_weights[:, None]
    denom = jnp.maximum(mask.sum(), 1.0)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(log_probs, targets[..., None], axis=-1)[..., 0]
    loss = -(ll * mask).sum() / denom
    correct = (jnp.argmax(logits, axis=-1) == targets).astype(jnp.float32)
    acc = (correct * mask).sum() / denom
    return loss, acc


def classification_loss(
    logits: jnp.ndarray, labels: jnp.ndarray,
    row_weights: jnp.ndarray = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    logits = logits.astype(jnp.float32)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(log_probs, labels[..., None], axis=-1)[..., 0]
    correct = (jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32)
    if row_weights is None:
        return -ll.mean(), correct.mean()
    denom = jnp.maximum(row_weights.sum(), 1.0)
    return (-(ll * row_weights).sum() / denom,
            (correct * row_weights).sum() / denom)


def tok_multitask_loss(
    outputs: Dict[str, jnp.ndarray],
    batch: Dict[str, jnp.ndarray],
    w_recon: float = 1.0,
    w_cls: float = 1.0,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    rw = batch.get("is_real")
    recon, recon_acc = token_reconstruction_loss(
        outputs["recon"], batch["dec_tgt"], row_weights=rw)
    cls, cls_acc = classification_loss(
        outputs["cls"], batch["label"], row_weights=rw)
    total = w_recon * recon + w_cls * cls
    return total, {
        "loss": total,
        "recon_loss": recon,
        "recon_acc": recon_acc,
        "cls_loss": cls,
        "cls_acc": cls_acc,
    }


def tok_multitask_loss_fused(
    outputs: Dict[str, jnp.ndarray],
    batch: Dict[str, jnp.ndarray],
    w_recon: float = 1.0,
    w_cls: float = 1.0,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Loss assembly for ``Sketchformer.forward_tok_loss`` outputs (the
    chunked in-model CE — recon loss/acc arrive precomputed). Same metric
    keys as :func:`tok_multitask_loss`."""
    recon, recon_acc = outputs["recon_loss"], outputs["recon_acc"]
    cls, cls_acc = classification_loss(
        outputs["cls"], batch["label"], row_weights=batch.get("is_real"))
    total = w_recon * recon + w_cls * cls
    return total, {
        "loss": total,
        "recon_loss": recon,
        "recon_acc": recon_acc,
        "cls_loss": cls,
        "cls_acc": cls_acc,
    }


def cont_multitask_loss(
    outputs: Dict[str, jnp.ndarray],
    batch: Dict[str, jnp.ndarray],
    num_mixtures: int,
    w_recon: float = 1.0,
    w_cls: float = 1.0,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    rw = batch.get("is_real")
    dec_mask = batch["dec_mask"]
    if rw is not None:
        # zero duplicate rows' positions: mdn_loss normalizes by mask sum
        dec_mask = dec_mask * rw[:, None]
    nll_xy, nll_pen = mdn.mdn_loss(
        outputs["recon"], num_mixtures,
        batch["tgt_xy"], batch["tgt_pen"], dec_mask)
    cls, cls_acc = classification_loss(
        outputs["cls"], batch["label"], row_weights=rw)
    recon = nll_xy + nll_pen
    total = w_recon * recon + w_cls * cls
    return total, {
        "loss": total,
        "recon_loss": recon,
        "gmm_nll": nll_xy,
        "pen_ce": nll_pen,
        "cls_loss": cls,
        "cls_acc": cls_acc,
    }
