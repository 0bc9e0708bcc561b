"""Additive RNN-T joint network.

Capability parity with the reference joint (reference rnnt/joint.py:4-55):
optional per-side Linear projections (disabled when configured with -1),
broadcast add over the T×U lattice, tanh, Linear to ``num_classes``;
``blank_idx = num_classes - 1``; plus the per-(t,u) ``single`` variant used
by decode.

TPU note: ``joint_apply`` materializes the (B, T, U, H) lattice and is only
meant for tiny shapes / correctness tests.  The training path computes the
joint chunk-wise inside the transducer loss (rnnt_tpu/ops/transducer.py) or
fully fused in Pallas so the lattice never hits HBM.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class JointSpec:
    # <= 0 disables the per-side input projection (reference rnnt/joint.py:8-12).
    audio_features: int
    text_features: int
    hidden_features: int
    num_classes: int

    @property
    def blank_idx(self) -> int:
        return self.num_classes - 1


def _linear_init(key, in_dim, out_dim, dtype):
    wkey, bkey = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_dim)
    return {"w": jax.random.uniform(wkey, (in_dim, out_dim), minval=-bound,
                                    maxval=bound, dtype=dtype),
            "b": jax.random.uniform(bkey, (out_dim,), minval=-bound,
                                    maxval=bound, dtype=dtype)}


def joint_init(key: jax.Array, spec: JointSpec, dtype=jnp.float32,
               simple: bool = False) -> dict:
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    params = {"out": _linear_init(k3, spec.hidden_features, spec.num_classes, dtype)}
    if spec.audio_features > 0:
        params["audio_proj"] = _linear_init(k1, spec.audio_features,
                                            spec.hidden_features, dtype)
    if spec.text_features > 0:
        params["text_proj"] = _linear_init(k2, spec.text_features,
                                           spec.hidden_features, dtype)
    if simple:
        # Factored "simple" joint heads for the pruned transducer loss
        # (ops/transducer_pruned.py): per-side raw-dim -> V projections.
        da = spec.audio_features if spec.audio_features > 0 else spec.hidden_features
        dt = spec.text_features if spec.text_features > 0 else spec.hidden_features
        params["simple"] = {"am": _linear_init(k4, da, spec.num_classes, dtype),
                            "lm": _linear_init(k5, dt, spec.num_classes, dtype)}
    return params


def _proj(p, x):
    y = jnp.dot(x, p["w"].astype(x.dtype), preferred_element_type=jnp.float32)
    return (y + p["b"].astype(jnp.float32)).astype(x.dtype)


def project_sides(params, audio, text):
    """Apply the optional per-side projections (no lattice yet)."""
    if "audio_proj" in params:
        audio = _proj(params["audio_proj"], audio)
    if "text_proj" in params:
        text = _proj(params["text_proj"], text)
    return audio, text


def joint_apply(params, audio: jax.Array, text: jax.Array) -> jax.Array:
    """Full-lattice joint: audio (B, T, H) + text (B, U, H) ->
    logits (B, T, U, V).  Test/reference path only — O(B·T·U·V) HBM."""
    audio, text = project_sides(params, audio, text)
    h = jnp.tanh(audio[:, :, None, :] + text[:, None, :, :])
    return _proj(params["out"], h)


def joint_single(params, audio_frame: jax.Array, text_frame: jax.Array) -> jax.Array:
    """Per-(t, u) joint for decode (reference rnnt/joint.py:44-55):
    (B, H) + (B, H) -> (B, V)."""
    audio_frame, text_frame = project_sides(params, audio_frame, text_frame)
    h = jnp.tanh(audio_frame + text_frame)
    return _proj(params["out"], h)


def joint_window(params, audio_frames: jax.Array, text_frame: jax.Array) -> jax.Array:
    """Joint of W audio frames against one text feature per lane:
    (B, W, H) + (B, H) -> (B, W, V).

    Used by the blank-skip greedy decode: one MXU matmul scores a whole
    window of frames against the current predictor state, instead of W
    sequential ``joint_single`` calls (one per while-loop iteration)."""
    audio_frames, text_frame = project_sides(params, audio_frames, text_frame)
    h = jnp.tanh(audio_frames + text_frame[:, None, :])
    return _proj(params["out"], h)
