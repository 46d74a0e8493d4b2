"""The Sketchformer model: encoder -> self-attn bottleneck -> decoder + heads.

Capability parity with the reference model (reference:
models/sketchformer.py — ``Transformer(BaseModel)``: token or continuous
input embedding, N-layer encoder, self-attention bottleneck producing the
fixed-length embedding ("lowerdim"), N-layer decoder cross-attending the
bottleneck, output head = dictionary softmax (tok) or MDN/GMM (cont), plus a
classifier MLP on the bottleneck; ``encode()`` for embedding extraction and
autoregressive ``predict`` for reconstruction).

TPU-first design points:
- one flax module with three entry methods (``__call__`` teacher-forced
  train path, ``encode`` embedding extraction, ``decode_tokens`` single
  cached AR step) sharing parameters;
- trunk runs in a configurable compute dtype (bf16 on TPU -> MXU), heads and
  losses in f32;
- the AR path keeps a static-shape KV cache (see models/attention.py) — the
  reference re-runs the full decoder per step;
- attention backend switchable to the fused Pallas kernel via
  ``attn_impl='pallas'``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from sketchformer_tpu.models.attention import (
    key_mask_from_float,
    key_mask_from_ids,
)
from sketchformer_tpu.models.bottleneck import Bottleneck
from sketchformer_tpu.models.embeddings import ContinuousEmbed, TokenEmbed
from sketchformer_tpu.models.heads import ClassifierHead, MDNHead, TokenHead
from sketchformer_tpu.models.transformer import Decoder, Encoder
from sketchformer_tpu.utils.hparams import HParams


@dataclasses.dataclass(frozen=True)
class SketchformerConfig:
    """Static model configuration (hashable; safe to close over in jit)."""

    vocab_size: int = 10004        # grid 100x100 + specials
    num_classes: int = 345
    max_len: int = 256
    d_model: int = 256
    num_layers: int = 8
    num_heads: int = 8
    dff: int = 512
    dropout: float = 0.1
    lowerdim: int = 256
    bottleneck_mode: str = "attn"  # attn | mean | direct
    num_queries: int = 4
    use_continuous: bool = False
    num_mixtures: int = 20
    attn_impl: str = "xla"         # xla | pallas
    norm_first: bool = True
    qk_norm: bool = False          # per-head q/k LayerNorm (stability)
    dtype: str = "float32"         # trunk compute dtype; bfloat16 on TPU

    @property
    def compute_dtype(self) -> jnp.dtype:
        return jnp.dtype(self.dtype)

    @classmethod
    def default_hparams(cls) -> HParams:
        """Reference-style ``default_hparams()`` for k=v CLI overrides."""
        return HParams(**dataclasses.asdict(cls()))

    @classmethod
    def from_hparams(cls, hps: HParams) -> "SketchformerConfig":
        return cls(**hps.values())


class Sketchformer(nn.Module):
    config: SketchformerConfig

    def setup(self) -> None:
        cfg = self.config
        dt = cfg.compute_dtype
        if cfg.use_continuous:
            self.enc_embed = ContinuousEmbed(cfg.d_model, cfg.max_len, dt)
            self.dec_embed = ContinuousEmbed(cfg.d_model, cfg.max_len, dt)
            self.out_head = MDNHead(cfg.num_mixtures, dt)
        else:
            self.enc_embed = TokenEmbed(cfg.vocab_size, cfg.d_model, cfg.max_len, dt)
            self.dec_embed = TokenEmbed(cfg.vocab_size, cfg.d_model, cfg.max_len, dt)
            self.out_head = TokenHead(cfg.vocab_size, dt)
        self.encoder = Encoder(
            cfg.num_layers, cfg.num_heads, cfg.d_model, cfg.dff,
            cfg.dropout, dt, cfg.attn_impl, cfg.norm_first, cfg.qk_norm)
        self.bottleneck = Bottleneck(
            cfg.bottleneck_mode, cfg.lowerdim, cfg.num_queries,
            cfg.d_model, cfg.num_heads, cfg.dropout, dt)
        self.decoder = Decoder(
            cfg.num_layers, cfg.num_heads, cfg.d_model, cfg.dff,
            cfg.dropout, dt, cfg.attn_impl, cfg.norm_first, cfg.qk_norm)
        self.classifier = ClassifierHead(
            cfg.num_classes, cfg.lowerdim, cfg.dropout, dt)

    # -- mask helpers -------------------------------------------------------
    # Masks flow through the model as 2-D (B, T) boolean KEY masks + a
    # ``causal`` flag: the Pallas kernel applies them without materializing
    # a (B, Tq, Tk) tensor (round-2 redesign; the XLA path builds its 4-D
    # mask internally in MultiHeadAttention).
    def _enc_key_mask(self, enc, enc_mask):
        if self.config.use_continuous:
            return None if enc_mask is None else key_mask_from_float(enc_mask)
        return key_mask_from_ids(enc)

    # -- encoder side -----------------------------------------------------
    def encode(
        self,
        enc: jnp.ndarray,
        enc_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        """Sketch batch -> (z, memory, memory_mask); z is the embedding."""
        cfg = self.config
        key_mask = self._enc_key_mask(enc, enc_mask)
        if cfg.use_continuous:
            x = self.enc_embed(enc.astype(cfg.compute_dtype))
        else:
            x = self.enc_embed(enc)
        enc_out = self.encoder(
            x, key_mask=key_mask, deterministic=deterministic)
        return self.bottleneck(enc_out, key_mask, deterministic=deterministic)

    def embed(self, enc, enc_mask=None, deterministic: bool = True):
        """Embedding-extraction entry point (reference ``encode()`` API)."""
        z, _, _ = self.encode(enc, enc_mask, deterministic)
        return z.astype(jnp.float32)

    def memory_from_z(self, z: jnp.ndarray) -> jnp.ndarray:
        """Decoder memory from a stored embedding (decode-from-z path)."""
        return self.bottleneck.expand_z(z)

    # -- teacher-forced training path -------------------------------------
    def _trunk(self, enc, dec_in, enc_mask, dec_key_mask, deterministic):
        """Shared encode->decode trunk: returns (z, dec_out)."""
        cfg = self.config
        z, memory, memory_mask = self.encode(enc, enc_mask, deterministic)
        if cfg.use_continuous:
            self_key = (None if dec_key_mask is None
                        else key_mask_from_float(dec_key_mask))
            x = self.dec_embed(dec_in.astype(cfg.compute_dtype))
        else:
            self_key = key_mask_from_ids(dec_in)
            x = self.dec_embed(dec_in)
        dec_out = self.decoder(
            x, memory, self_key_mask=self_key, causal=True,
            cross_key_mask=memory_mask,
            deterministic=deterministic)
        return z, dec_out

    def __call__(
        self,
        enc: jnp.ndarray,
        dec_in: jnp.ndarray,
        enc_mask: Optional[jnp.ndarray] = None,
        dec_key_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Dict[str, Any]:
        z, dec_out = self._trunk(
            enc, dec_in, enc_mask, dec_key_mask, deterministic)
        return {
            "recon": self.out_head(dec_out),
            "cls": self.classifier(z, deterministic=deterministic),
            "embedding": z.astype(jnp.float32),
        }

    def forward_tok_loss(
        self,
        enc: jnp.ndarray,
        dec_in: jnp.ndarray,
        dec_tgt: jnp.ndarray,
        enc_mask: Optional[jnp.ndarray] = None,
        dec_key_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        pad_id: int = 0,
        row_weights: Optional[jnp.ndarray] = None,
    ) -> Dict[str, Any]:
        """Token-mode forward that computes the reconstruction CE INSIDE
        the model via the chunked fused head (TokenHead.fused_ce) so the
        (B, T, vocab) f32 logits never materialize — the train/eval step
        hot path. Returns recon_loss/recon_acc scalars + cls logits.
        ``row_weights`` (B,) zeroes repeat-padded duplicate rows out of
        the CE (batch["is_real"])."""
        if self.config.use_continuous:
            raise ValueError("forward_tok_loss is token-mode only")
        z, dec_out = self._trunk(
            enc, dec_in, enc_mask, dec_key_mask, deterministic)
        recon_loss, recon_acc = self.out_head.fused_ce(
            dec_out, dec_tgt, pad_id=pad_id, row_weights=row_weights,
            impl="pallas" if self.config.attn_impl == "pallas" else "xla")
        return {
            "recon_loss": recon_loss,
            "recon_acc": recon_acc,
            "cls": self.classifier(z, deterministic=deterministic),
            "embedding": z.astype(jnp.float32),
        }

    # -- cached AR decode step ---------------------------------------------
    def decode_step(
        self,
        dec_in_t: jnp.ndarray,   # tok: (B, 1) int32 | cont: (B, 1, 5) f32
        memory: jnp.ndarray,
        memory_mask: Optional[jnp.ndarray],
        t: jnp.ndarray,          # scalar int32 position
    ) -> jnp.ndarray:
        """One AR step with KV cache (mutable 'cache' collection).

        Returns head output for the single new position, (B, 1, ...).
        Position encoding is indexed dynamically at ``t``.
        """
        cfg = self.config
        if cfg.use_continuous:
            x = self.dec_embed(dec_in_t.astype(cfg.compute_dtype), pos=t)
        else:
            x = self.dec_embed(dec_in_t, pos=t)
        dec_out = self.decoder(
            x, memory, cross_key_mask=memory_mask,
            deterministic=True, decode=True)
        return self.out_head(dec_out)

    # Spare KV-cache slots beyond max_len: a decode whose step-loop length
    # exactly equals the cache length miscompiles on the TPU runtime in this
    # environment (empirically: T==Tmax -> all-NaN outputs from step 0;
    # T<Tmax or a larger cache is fine — bisected exhaustively; standalone
    # repro: tools/repro_scan_cache_nan.py). 8 slots are tile-aligned
    # padding that sidesteps the bug zone.
    CACHE_PAD = 8

    def init_cache(self, batch_size: int, memory: jnp.ndarray,
                   memory_mask: Optional[jnp.ndarray],
                   cache_pad: Optional[int] = None):
        """Build zero-filled cache variables via a dummy full-length pass.

        ``cache_pad`` overrides :data:`CACHE_PAD` — ONLY for the NaN-bug
        repro harness; production decode must keep the default.
        """
        cfg = self.config
        pad = self.CACHE_PAD if cache_pad is None else cache_pad
        pad_len = cfg.max_len + pad
        # raw zeros (no dec_embed): only the cache SHAPES matter here, and
        # the posenc table is max_len-sized
        x = jnp.zeros((batch_size, pad_len, cfg.d_model), cfg.compute_dtype)
        self.decoder(x, memory, cross_key_mask=memory_mask,
                     deterministic=True, decode=True)


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

from sketchformer_tpu.models.registry import models  # noqa: E402


@models.register("sketchformer")
def build_sketchformer(**overrides) -> Sketchformer:
    cfg = SketchformerConfig(**overrides)
    return Sketchformer(cfg)


@models.register("sketchformer-cont")
def build_sketchformer_cont(**overrides) -> Sketchformer:
    overrides.setdefault("use_continuous", True)
    cfg = SketchformerConfig(**overrides)
    return Sketchformer(cfg)
