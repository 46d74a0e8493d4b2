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
    logits: jnp.ndarray, targets: jnp.ndarray, pad_id: int = PAD_ID
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Masked mean CE and accuracy over non-pad target positions."""
    logits = logits.astype(jnp.float32)
    mask = (targets != pad_id).astype(jnp.float32)
    denom = jnp.maximum(mask.sum(), 1.0)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(log_probs, targets[..., None], axis=-1)[..., 0]
    loss = -(ll * mask).sum() / denom
    correct = (jnp.argmax(logits, axis=-1) == targets).astype(jnp.float32)
    acc = (correct * mask).sum() / denom
    return loss, acc


def classification_loss(
    logits: jnp.ndarray, labels: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    logits = logits.astype(jnp.float32)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(log_probs, labels[..., None], axis=-1)[..., 0]
    acc = (jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32).mean()
    return -ll.mean(), acc


def tok_multitask_loss(
    outputs: Dict[str, jnp.ndarray],
    batch: Dict[str, jnp.ndarray],
    w_recon: float = 1.0,
    w_cls: float = 1.0,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    recon, recon_acc = token_reconstruction_loss(outputs["recon"], batch["dec_tgt"])
    cls, cls_acc = classification_loss(outputs["cls"], batch["label"])
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
    cls, cls_acc = classification_loss(outputs["cls"], batch["label"])
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
    nll_xy, nll_pen = mdn.mdn_loss(
        outputs["recon"], num_mixtures,
        batch["tgt_xy"], batch["tgt_pen"], batch["dec_mask"])
    cls, cls_acc = classification_loss(outputs["cls"], batch["label"])
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
