"""Output heads: token softmax, MDN/GMM, classifier.

Capability parity with the reference's heads (reference:
models/sketchformer.py — (i) Dense->softmax over the dictionary in tok mode,
(ii) Dense->MDN params (pi, mu, sigma, rho, pen logits) in cont mode,
(iii) classifier MLP on the bottleneck -> 345 class logits).

All heads emit float32 logits/params regardless of trunk dtype — losses and
softmaxes stay in f32 while the MXU-heavy trunk runs bf16.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from sketchformer_tpu.models.dropout import Dropout


class TokenHead(nn.Module):
    vocab_size: int
    dtype: jnp.dtype = jnp.float32

    def setup(self) -> None:
        self.proj = nn.Dense(self.vocab_size, dtype=self.dtype)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.proj(x).astype(jnp.float32)

    def fused_ce(self, x: jnp.ndarray, targets: jnp.ndarray,
                 pad_id: int = 0, target_chunk: int = 16,
                 row_weights: jnp.ndarray = None, impl: str = "xla"):
        """Masked-mean CE + accuracy WITHOUT materializing the full
        (B, T, vocab) f32 logits tensor.

        The vocab-10k head is HBM-bound, not compute-bound: full f32
        logits are ~2 GB at B=512/T=96 and round-trip HBM ~5x through
        fwd/loss/argmax/bwd (~12 ms/step measured on v5e).

        ``impl='xla'``: the time axis is processed in rematerialized
        chunks — each chunk's logits live only inside its (checkpointed)
        segment, and the backward recomputes them chunk-by-chunk. The
        chunk logits still round-trip HBM (measured 13 ms fwd+bwd).

        ``impl='pallas'``: ops/pallas_ce.py — logits tiles reduce to
        per-row (ll, correct) inside VMEM; fwd+bwd touches HBM only for
        the operands. Both match train.loss.token_reconstruction_loss
        (tests/test_train.py::test_fused_ce_matches_plain,
        tests/test_pallas_ce.py).
        """
        B, T, _ = x.shape
        if impl == "pallas":
            from sketchformer_tpu.ops import pallas_ce

            pvars = self.proj.variables["params"]
            d = x.shape[-1]
            ll, corr = pallas_ce.token_ce_rows(
                x.reshape(B * T, d), pvars["kernel"], pvars["bias"],
                targets.reshape(B * T))
            m = (targets != pad_id).astype(jnp.float32)
            if row_weights is not None:
                m = m * row_weights[:, None]
            mf = m.reshape(B * T)
            denom = jnp.maximum(mf.sum(), 1.0)
            return -(ll * mf).sum() / denom, (corr * mf).sum() / denom
        chunk = min(target_chunk, T)
        while T % chunk:
            chunk -= 1
        n = T // chunk

        def piece(hc, tc):
            logits = self.proj(hc).astype(jnp.float32)   # (B, C, V)
            lse = jax.nn.logsumexp(logits, axis=-1)
            ll = jnp.take_along_axis(
                logits, tc[..., None], axis=-1)[..., 0] - lse
            corr = (jnp.argmax(logits, axis=-1) == tc)
            m = (tc != pad_id).astype(jnp.float32)
            if row_weights is not None:
                # zero repeat-padded duplicate rows (batch["is_real"])
                m = m * row_weights[:, None]
            return (ll * m).sum(), (corr * m).sum(), m.sum()

        piece = jax.checkpoint(piece)
        ll_s = jnp.float32(0)
        acc_s = jnp.float32(0)
        cnt = jnp.float32(0)
        for i in range(n):
            sl = slice(i * chunk, (i + 1) * chunk)
            a, b, c = piece(x[:, sl], targets[:, sl])
            ll_s, acc_s, cnt = ll_s + a, acc_s + b, cnt + c
        denom = jnp.maximum(cnt, 1.0)
        return -ll_s / denom, acc_s / denom


class MDNHead(nn.Module):
    num_mixtures: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        raw = nn.Dense(
            6 * self.num_mixtures + 3, dtype=self.dtype, name="proj"
        )(x)
        return raw.astype(jnp.float32)


class ClassifierHead(nn.Module):
    num_classes: int
    hidden: int = 256
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        h = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(z)
        h = nn.relu(h)
        if self.dropout > 0.0:
            h = Dropout(self.dropout)(h, deterministic=deterministic)
        logits = nn.Dense(self.num_classes, dtype=self.dtype, name="fc2")(h)
        return logits.astype(jnp.float32)
