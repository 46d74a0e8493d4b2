"""In-kernel PRNG dropout for the fused train kernels.

Round 2 drove dropout from an EXTERNAL u8 bits tensor drawn once in XLA
and consumed bit-for-bit by the fused fwd and bwd kernels. Correct, but
expensive: the flagship train step (B=512, T=96, d=256, L=8 enc + 8 dec,
5 sites per enc+dec layer pair) moves 504 MB of u8 bits through HBM per
step — measured ~4.3 ms of a 58 ms step (docs/PERF_TRAIN.md).

This module replaces the bits tensor with the TPU's hardware PRNG
(``pltpu.prng_seed`` / ``pltpu.prng_random_bits``), regenerated inside
BOTH the fwd and bwd kernels. The one correctness requirement is that the
two regenerations agree exactly, even though the fwd stack kernel and the
per-layer bwd kernels tile the batch with DIFFERENT grid block sizes
(NB). The draw is therefore keyed per (site, GLOBAL batch element):

    prng_seed(seed, site * SITE_STRIDE + b);  bits = prng_random_bits((T, d))

so the stream for batch row ``b`` at dropout site ``site`` is independent
of the grid geometry (verified on v5e: NB=4 vs NB=8 draws are bit-equal).
``site`` is the absolute dropout-site index within the stack (encoder:
2*layer + {0=attn, 1=ffn}; decoder: 3*layer + {0=self, 1=cross, 2=ffn}).

Semantics match models/dropout.py's u8-threshold exactly: an element
drops when its random byte < round(rate * 256); kept elements scale by
1 / (1 - thresh/256). :func:`emit_dropout_bits` regenerates the identical
byte streams as a standalone kernel, which is what pins equivalence on
real hardware: feeding its output to the BITS-mode fused path (itself
pinned to the composed flax path on CPU) must reproduce the PRNG-mode
values and gradients bit-for-bit (tests/test_prng_dropout.py, TPU-only —
interpret mode stubs the PRNG to zeros, so CPU cannot emulate this).

Seed scope: the (1,) int32 seed derives from the step's dropout rng, so
it changes per step / per microbatch / per shard_map shard (the rng folds
in the data-axis index) — masks never repeat across steps or shards.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Distinct (layer, batch-element) streams: layer * LAYER_STRIDE + b must
# be injective. Layers < 2^7 in practice; batch < 2^20.
LAYER_STRIDE = 1 << 20

# Mosaic on this target accepts at most 2 seed values per prng_seed call;
# the (layer, b) pair is mixed into one int32 instead of passed separately.


def seed_from_rng(rng: jax.Array) -> jnp.ndarray:
    """(1,) int32 kernel seed from a JAX PRNG key (cheap scalar draw)."""
    return jax.lax.bitcast_convert_type(
        jax.random.bits(rng, (1,), jnp.uint32), jnp.int32)


def draw_layer_bytes(seed, layer: int, g, NB: int, T: int, d: int,
                     nsites: int) -> list:
    """In-kernel draw of one layer's dropout bytes at batch grid cell
    ``g`` (NB rows per cell): a list of ``nsites`` (NB*T, d) int32 panes
    with values in [0, 256).

    ONE 32-bit draw per element serves every site in the layer (byte k of
    the word -> site k; a layer has at most 3 sites), so the PRNG runs
    2-3x less than a per-site scheme. Rows are drawn PER BATCH ELEMENT
    (seeded by the global index g*NB + j), so the stream is identical for
    any grid NB — the fwd stack kernel and the per-layer bwd kernels may
    tile the batch differently and still see the same bytes.
    """
    assert nsites <= 3
    rows = []
    for j in range(NB):
        pltpu.prng_seed(seed, layer * LAYER_STRIDE + g * NB + j)
        rows.append(pltpu.prng_random_bits((T, d)))
    bits = jnp.concatenate(rows, axis=0)          # (NB*T, d) int32
    return [jnp.bitwise_and(
        jax.lax.shift_right_logical(bits, 8 * k), 255)
        for k in range(nsites)]


def _emit_kernel(seed_ref, o_ref, *, nsites):
    li = pl.program_id(0)
    b = pl.program_id(1)
    T, d = o_ref.shape[2], o_ref.shape[3]
    pltpu.prng_seed(seed_ref[0], li * LAYER_STRIDE + b)
    bits = pltpu.prng_random_bits((T, d))
    for k in range(nsites):
        o_ref[k] = jnp.bitwise_and(
            jax.lax.shift_right_logical(bits, 8 * k), 255)[None]


def emit_dropout_bits(seed: jnp.ndarray, num_layers: int, nsites: int,
                      B: int, T: int, d: int) -> jnp.ndarray:
    """Regenerate the exact byte streams the fused kernels draw, as a
    (num_layers * nsites, B, T, d) uint8 tensor with site index
    s = layer * nsites + k (test/verification path: feed it to the
    bits-mode kernels and compare against prng mode)."""
    bits = pl.pallas_call(
        functools.partial(_emit_kernel, nsites=nsites),
        grid=(num_layers, B),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((nsites, 1, T, d),
                               lambda li, b: (li, b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (num_layers * nsites, B, T, d), jnp.int32),
    )(seed)
    return bits.astype(jnp.uint8)


def resolve_impl(dropout_impl: str) -> str:
    """'auto' -> 'prng' on real TPU, 'bits' elsewhere (interpret mode's
    PRNG is a zero-stub — 'prng' off-TPU would silently drop everything)."""
    if dropout_impl == "auto":
        return "prng" if jax.default_backend() == "tpu" else "bits"
    if dropout_impl == "prng" and jax.default_backend() != "tpu":
        raise ValueError(
            "dropout_impl='prng' requires a real TPU backend (interpret "
            "mode stubs prng_random_bits to zeros)")
    if dropout_impl not in ("bits", "prng"):
        raise ValueError(f"unknown dropout_impl {dropout_impl!r}")
    return dropout_impl
