"""Transformer encoder / decoder stacks.

Capability parity with the reference's layer definitions (reference: models/
transformer layer module — EncoderLayer = MHA(self) + pointwise FFN,
DecoderLayer = masked MHA(self) + cross-MHA + FFN, stacked N times with
residuals + LayerNorm and dropout).

TPU-first deltas from the reference design:
- pre-LayerNorm by default (``norm_first=True``): stabler at depth and lets
  XLA fuse the norm into the surrounding elementwise chain; the reference's
  post-LN ordering is kept available for fidelity runs;
- the layer loop is ``nn.scan``-free (N is small, 4-8) so XLA sees straight-
  line code it can pipeline; remat can be applied at the stack level by the
  train step when memory-bound.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from sketchformer_tpu.models.attention import MultiHeadAttention
from sketchformer_tpu.models.dropout import Dropout


class FeedForward(nn.Module):
    d_model: int
    dff: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        h = nn.Dense(self.dff, dtype=self.dtype, name="in")(x)
        h = nn.relu(h)
        h = nn.Dense(self.d_model, dtype=self.dtype, name="out")(h)
        if self.dropout > 0.0:
            h = Dropout(self.dropout)(h, deterministic=deterministic)
        return h


class EncoderLayer(nn.Module):
    num_heads: int
    d_model: int
    dff: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"
    norm_first: bool = True
    qk_norm: bool = False

    @nn.compact
    def __call__(self, x, mask=None, deterministic=True, key_mask=None):
        ln = lambda name: nn.LayerNorm(dtype=self.dtype, name=name)
        mha = MultiHeadAttention(
            self.num_heads, self.d_model, self.dropout, self.dtype,
            self.attn_impl, self.qk_norm, name="self_attn")
        ffn = FeedForward(self.d_model, self.dff, self.dropout, self.dtype,
                          name="ffn")
        if self.norm_first:
            h = ln("ln1")(x)
            x = x + mha(h, h, mask=mask, key_mask=key_mask,
                        deterministic=deterministic)
            x = x + ffn(ln("ln2")(x), deterministic=deterministic)
        else:
            x = ln("ln1")(x + mha(x, x, mask=mask, key_mask=key_mask,
                                  deterministic=deterministic))
            x = ln("ln2")(x + ffn(x, deterministic=deterministic))
        return x


class DecoderLayer(nn.Module):
    num_heads: int
    d_model: int
    dff: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"
    norm_first: bool = True
    qk_norm: bool = False

    @nn.compact
    def __call__(self, x, memory, self_mask=None, cross_mask=None,
                 deterministic=True, decode=False,
                 self_key_mask=None, causal=False, cross_key_mask=None):
        ln = lambda name: nn.LayerNorm(dtype=self.dtype, name=name)
        self_attn = MultiHeadAttention(
            self.num_heads, self.d_model, self.dropout, self.dtype,
            self.attn_impl, self.qk_norm, name="self_attn")
        cross_attn = MultiHeadAttention(
            self.num_heads, self.d_model, self.dropout, self.dtype,
            "xla", self.qk_norm,
            name="cross_attn")  # cross seq is short (bottleneck) — XLA
        ffn = FeedForward(self.d_model, self.dff, self.dropout, self.dtype,
                          name="ffn")
        if self.norm_first:
            h = ln("ln1")(x)
            x = x + self_attn(h, h, mask=self_mask, key_mask=self_key_mask,
                              causal=causal,
                              deterministic=deterministic, decode=decode)
            x = x + cross_attn(ln("ln2")(x), memory, mask=cross_mask,
                               key_mask=cross_key_mask,
                               deterministic=deterministic)
            x = x + ffn(ln("ln3")(x), deterministic=deterministic)
        else:
            x = ln("ln1")(x + self_attn(x, x, mask=self_mask,
                                        key_mask=self_key_mask,
                                        causal=causal,
                                        deterministic=deterministic,
                                        decode=decode))
            x = ln("ln2")(x + cross_attn(x, memory, mask=cross_mask,
                                         key_mask=cross_key_mask,
                                         deterministic=deterministic))
            x = ln("ln3")(x + ffn(x, deterministic=deterministic))
        return x


class Encoder(nn.Module):
    num_layers: int
    num_heads: int
    d_model: int
    dff: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"
    norm_first: bool = True
    qk_norm: bool = False

    @nn.compact
    def __call__(self, x, mask=None, deterministic=True, key_mask=None):
        # Fused whole-stack path (ops/pallas_encoder*.py): one kernel for
        # the L-layer loop, VMEM-resident activations, custom VJP for
        # training. Engaged after init (params must exist to be stacked);
        # the composed path below remains the param-structure owner and
        # the numerical oracle (tests/test_pallas_encoder*.py).
        from sketchformer_tpu.ops.pallas_encoder import MAX_FUSED_LEN
        from sketchformer_tpu.utils.engines import note_engine

        if (self.attn_impl == "pallas" and self.norm_first and mask is None
                and x.shape[1] <= MAX_FUSED_LEN
                and not self.is_initializing()):
            return self._fused_stack(x, key_mask, deterministic)
        if self.attn_impl == "pallas" and not self.is_initializing():
            why = ("post-LN config" if not self.norm_first
                   else "structured mask" if mask is not None
                   else f"T={x.shape[1]} > fused limit {MAX_FUSED_LEN}")
            note_engine("encoder-stack", "composed", why)
        if self.dropout > 0.0:
            x = Dropout(self.dropout)(x, deterministic=deterministic)
        for i in range(self.num_layers):
            x = EncoderLayer(
                self.num_heads, self.d_model, self.dff, self.dropout,
                self.dtype, self.attn_impl, self.norm_first, self.qk_norm,
                name=f"layer_{i}")(x, mask=mask, key_mask=key_mask,
                                   deterministic=deterministic)
        if self.norm_first:
            x = nn.LayerNorm(dtype=self.dtype, name="ln_out")(x)
        return x

    def _fused_stack(self, x, key_mask, deterministic):
        from sketchformer_tpu.ops.pallas_encoder import (
            fused_encoder_stack,
            stack_encoder_weights,
        )
        from sketchformer_tpu.ops.pallas_encoder_train import (
            apply_final_ln,
            fused_encoder_stack_train,
        )

        train_drop = (not deterministic) and self.dropout > 0.0
        if train_drop:
            # stack-entry dropout stays a flax site; per-layer sites run
            # in-kernel (hardware PRNG on TPU, external u8 bits elsewhere
            # — ops/pallas_dropout.py)
            x = Dropout(self.dropout)(x, deterministic=False)
        w = stack_encoder_weights(
            self.variables["params"], num_layers=self.num_layers,
            compute_dtype=self.dtype)
        if deterministic:
            # forward-only inference kernel (eval / embed); gradients
            # require deterministic=False, which takes the VJP'd path
            return fused_encoder_stack(
                x, key_mask, w, num_heads=self.num_heads,
                qk_norm=self.qk_norm)
        y = fused_encoder_stack_train(
            x, key_mask, w, num_heads=self.num_heads, qk_norm=self.qk_norm,
            dropout_rate=self.dropout,
            dropout_rng=self.make_rng("dropout") if train_drop else None)
        return apply_final_ln(y, w)


class Decoder(nn.Module):
    num_layers: int
    num_heads: int
    d_model: int
    dff: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"
    norm_first: bool = True
    qk_norm: bool = False

    @nn.compact
    def __call__(self, x, memory, self_mask=None, cross_mask=None,
                 deterministic=True, decode=False,
                 self_key_mask=None, causal=False, cross_key_mask=None):
        # Fused whole-stack teacher-forced path (ops/pallas_decoder_train)
        # — same structure as Encoder._fused_stack; AR decode (decode=True)
        # keeps the KV-cached per-step path.
        from sketchformer_tpu.ops.pallas_encoder import MAX_FUSED_LEN
        from sketchformer_tpu.utils.engines import note_engine

        if (self.attn_impl == "pallas" and self.norm_first and not decode
                and causal and self_mask is None and cross_mask is None
                and x.shape[1] <= MAX_FUSED_LEN
                and not self.is_initializing()):
            return self._fused_stack(
                x, memory, self_key_mask, cross_key_mask, deterministic)
        if (self.attn_impl == "pallas" and not decode
                and not self.is_initializing()):
            why = ("post-LN config" if not self.norm_first
                   else "structured mask" if (self_mask is not None
                                              or cross_mask is not None)
                   else "non-causal self-attention" if not causal
                   else f"T={x.shape[1]} > fused limit {MAX_FUSED_LEN}")
            note_engine("decoder-stack", "composed", why)
        if self.dropout > 0.0:
            x = Dropout(self.dropout)(x, deterministic=deterministic)
        for i in range(self.num_layers):
            x = DecoderLayer(
                self.num_heads, self.d_model, self.dff, self.dropout,
                self.dtype, self.attn_impl, self.norm_first, self.qk_norm,
                name=f"layer_{i}")(
                    x, memory, self_mask=self_mask, cross_mask=cross_mask,
                    deterministic=deterministic, decode=decode,
                    self_key_mask=self_key_mask, causal=causal,
                    cross_key_mask=cross_key_mask)
        if self.norm_first:
            x = nn.LayerNorm(dtype=self.dtype, name="ln_out")(x)
        return x

    def _fused_stack(self, x, memory, self_key_mask, cross_key_mask,
                     deterministic):
        from sketchformer_tpu.ops.pallas_decoder_train import (
            fused_decoder_stack,
            fused_decoder_stack_train,
            stack_decoder_weights,
        )
        from sketchformer_tpu.ops.pallas_encoder_train import apply_final_ln

        train_drop = (not deterministic) and self.dropout > 0.0
        if train_drop:
            x = Dropout(self.dropout)(x, deterministic=False)
        w = stack_decoder_weights(
            self.variables["params"], num_layers=self.num_layers,
            compute_dtype=self.dtype)
        if deterministic:
            return fused_decoder_stack(
                x, memory, self_key_mask, cross_key_mask, w,
                num_heads=self.num_heads, qk_norm=self.qk_norm)
        y = fused_decoder_stack_train(
            x, memory, self_key_mask, cross_key_mask, w,
            num_heads=self.num_heads, qk_norm=self.qk_norm,
            dropout_rate=self.dropout,
            dropout_rng=self.make_rng("dropout") if train_drop else None)
        return apply_final_ln(y, w)
