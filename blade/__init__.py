"""BLADE-TPU: TPU-native data-free acceleration framework for text-to-video diffusion.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of Video-BLADE
(reference: xiaolong-li1/VIDEO-BLADE):

  * ASA  — Adaptive block-Sparse Attention: per-head, input-dependent block
    masks predicted from a cheap pooled attention estimate, executed by a
    Pallas block-gather flash-attention kernel, with a Hilbert-curve 3-D token
    reordering for block locality.
  * TDM  — Trajectory Distribution Matching step distillation: 50-step
    samplers distilled into 8-step generators with a three-role
    (student / fake-score / frozen-real) setup, trained data-free from
    precomputed text embeddings only.

Model families: CogVideoX (v-prediction DDPM, joint text+video attention) and
Wan2.1 (flow matching, video-only self-attention + text cross-attention).

Everything is functional and jit-friendly: static shapes, `lax.scan` sampling
loops, `jax.sharding.Mesh` parallelism, Pallas kernels for the hot attention
paths.
"""

__version__ = "0.1.0"
