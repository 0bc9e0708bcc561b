"""rnnt_tpu — a TPU-native RNN-T (transducer) speech-recognition framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the reference
PyTorch repo jakepoz/rnnt (see /root/reference): streaming causal-conv
encoders, conv/LSTM predictors, additive joint networks, a fused transducer
lattice loss, jitted greedy/beam decode, a host-side data+augmentation
pipeline, and multi-chip data/tensor parallelism over a `jax.sharding.Mesh`.

Design stance (not a port):
  * pure-functional core: every layer is `init(key, ...) -> params` plus
    `apply(params, x, ...) -> y`; no stateful module objects.
  * feature-last `(B, T, C)` layout everywhere (TPU lane dim = channels).
  * static shapes + `lax.scan`/`lax.while_loop` control flow under `jit`.
  * the T×U joint lattice is never materialized at (B,T,U,V) — the loss is
    computed chunk-wise (XLA) or fully fused (Pallas).
"""

__version__ = "0.1.0"
