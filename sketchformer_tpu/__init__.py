"""sketchformer_tpu — a TPU-native JAX/Pallas rebuild of Sketchformer.

Sketchformer (Ribeiro et al., CVPR 2020, arXiv:2002.10381) is a Transformer
encoder-decoder that learns fixed-length embeddings of free-hand vector
sketches (QuickDraw stroke-3), trained multi-task: autoregressive sketch
reconstruction + classification, with the embedding reused for SBIR retrieval
and interpolation.

This package is a ground-up TPU-first re-design (NOT a port of the TF2
reference at leosampaio/sketchformer):

- compute path: JAX / XLA, bf16 matmuls on the MXU, Pallas kernels for fused
  attention (training) and KV-cached decode attention (AR reconstruction)
- parallelism: jax.sharding.Mesh + NamedSharding / jit-with-shardings; batch
  sharded over the ``data`` axis, optional head/FFN sharding over ``model``
- data: sharded npz streams -> host bucketing -> vectorized on-device
  transforms (normalize, delta-encode, tokenize) with length-bucketed padding
- experiment core: optax (Noam schedule), orbax checkpointing, metric writers

Layout::

    sketchformer_tpu/
      data/      stroke-3 geometry, tokenizers, shards, bucketed pipeline
      models/    embeddings, transformer, self-attn bottleneck, heads
      ops/       pallas kernels (flash attention, KV-cached decode), MDN math
      parallel/  mesh + sharding helpers
      train/     losses, schedules, train step/loop, checkpointing
      infer/     embedding extraction, batched greedy decode, SBIR eval
      utils/     hparams/config system, registries, metrics, rasterization
"""

__version__ = "0.1.0"
