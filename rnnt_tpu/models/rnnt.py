"""RNN-T model assembly: encoder + predictor + joint + transducer loss.

Capability parity with the reference container (reference rnnt/model.py:6-43):
prepend blank to the targets, run predictor and encoder, compute output
lengths, apply the joint over the lattice, return the mean transducer loss.

Here ``rnnt_loss_apply`` is a pure function of (params, state, batch, rng)
designed to sit inside one jitted, sharded train step; the joint+loss is the
memory-bounded chunked path (or the Pallas kernel), never the materialized
(B, T, U, V) lattice.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Union

import jax
import jax.numpy as jnp

from rnnt_tpu.models.encoder import EncoderSpec, encoder_apply, encoder_init, encoder_out_len
from rnnt_tpu.models.joint import JointSpec, joint_init
from rnnt_tpu.models.predictor import (
    ConvPredictorSpec,
    LSTMPredictorSpec,
    predictor_apply,
    predictor_init,
)
from rnnt_tpu.ops.transducer import transducer_loss


@dataclass(frozen=True)
class RNNTSpec:
    encoder: EncoderSpec
    predictor: Union[ConvPredictorSpec, LSTMPredictorSpec]
    joint: JointSpec
    # Loss chunking along T; tune to the HBM budget.
    loss_chunk_size: int = 16
    # "chunked" (XLA remat path), "pallas" (fused lattice kernel), or
    # "pruned" (banded lattice via a factored simple joint — a FLOP cut the
    # reference doesn't have; ops/transducer_pruned.py).
    loss_impl: str = "auto"  # auto | chunked | pallas | pruned
    # Pruned-loss knobs (loss_impl == "pruned" only).
    pruned_band: int = 16
    pruned_simple_scale: float = 0.5
    pruned_scale: float = 1.0
    # > 0 clamps d(loss)/d(logits) (torchaudio rnnt_loss clamp semantics).
    grad_clamp: float = -1.0
    # Shard the T axis of the loss lattice over the mesh "model" axis
    # (ops/lattice_tshard.py): per-device O(T/n) lattice memory for
    # long-form audio.  Forces the chunked loss path.
    lattice_shard_t: bool = False

    @property
    def blank_idx(self) -> int:
        return self.joint.blank_idx


def rnnt_init(key: jax.Array, spec: RNNTSpec, dtype=jnp.float32):
    """Returns (params, state) pytrees for the whole model."""
    ek, pk, jk = jax.random.split(key, 3)
    enc_params, enc_state = encoder_init(ek, spec.encoder, dtype)
    params = {
        "encoder": enc_params,
        "predictor": predictor_init(pk, spec.predictor, dtype),
        "joint": joint_init(jk, spec.joint, dtype,
                            simple=spec.loss_impl == "pruned"),
    }
    state = {"encoder": enc_state}
    return params, state


def resolve_loss_impl(impl: str) -> str:
    """'auto' -> the fused Pallas joint on TPU, the chunked XLA-remat joint
    elsewhere (interpret-mode kernels are only for tests)."""
    if impl == "auto":
        return "pallas" if jax.default_backend() == "tpu" else "chunked"
    return impl


def prepend_blank(targets: jax.Array, blank_idx: int) -> jax.Array:
    """(B, U) -> (B, U+1) with the blank symbol first
    (reference rnnt/model.py:20-21)."""
    B = targets.shape[0]
    blank_col = jnp.full((B, 1), blank_idx, dtype=targets.dtype)
    return jnp.concatenate([blank_col, targets], axis=1)


def rnnt_forward(params, state, features, spec: RNNTSpec, targets, *,
                 training: bool = False, rng: jax.Array | None = None):
    """Run encoder + predictor.  Returns (audio (B,T',H), text (B,U+1,H),
    new_state)."""
    erng = prng = None
    if rng is not None:
        erng, prng = jax.random.split(rng)
    prepended = prepend_blank(targets, spec.blank_idx)
    text = predictor_apply(params["predictor"], prepended, spec.predictor,
                           training=training, rng=prng)
    audio, enc_state = encoder_apply(params["encoder"], state["encoder"],
                                     features, spec.encoder,
                                     training=training, rng=erng)
    return audio, text, {"encoder": enc_state}


def rnnt_loss_apply(params, state, batch: dict, spec: RNNTSpec, *,
                    training: bool = False, rng: jax.Array | None = None):
    """Compute the scalar mean transducer loss for a padded batch.

    batch: {"features": (B, T, F) float, "feature_lens": (B,) int,
            "targets": (B, U) int, "target_lens": (B,) int}.
    Returns (loss, new_state).
    """
    audio, text, new_state = rnnt_forward(
        params, state, batch["features"], spec, batch["targets"],
        training=training, rng=rng)
    t_lens = encoder_out_len(batch["feature_lens"], spec.encoder)
    if spec.loss_impl == "pruned":
        from rnnt_tpu.ops.transducer_pruned import pruned_transducer_loss
        loss = pruned_transducer_loss(
            params["joint"], audio, text, batch["targets"], t_lens,
            batch["target_lens"], spec.blank_idx, band=spec.pruned_band,
            simple_scale=spec.pruned_simple_scale,
            pruned_scale=spec.pruned_scale,
            chunk_size=spec.loss_chunk_size, grad_clamp=spec.grad_clamp)
    elif resolve_loss_impl(spec.loss_impl) == "pallas":
        from rnnt_tpu.ops.transducer_pallas import transducer_loss_pallas
        loss = transducer_loss_pallas(
            params["joint"], audio, text, batch["targets"], t_lens,
            batch["target_lens"], spec.blank_idx,
            grad_clamp=spec.grad_clamp)
    else:
        loss = transducer_loss(
            params["joint"], audio, text, batch["targets"], t_lens,
            batch["target_lens"], spec.blank_idx,
            chunk_size=spec.loss_chunk_size, grad_clamp=spec.grad_clamp)
    return loss, new_state
