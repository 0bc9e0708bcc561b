"""Causal 1-D convolution with an explicit streaming carry state.

Capability parity with the reference's CausalConv1d (reference:
rnnt/causalconv.py:9-40): the conv never sees the future.  A left pad of
``(k-1)*d - s + 1`` zeros makes the output at step ``t`` depend only on
inputs ``<= t`` (up to an optional bounded lookahead ``additional_context``
subtracted from the left pad, reference rnnt/causalconv.py:15-23).

TPU-native design decisions (not a port):
  * feature-last ``(B, T, C)`` layout — channels land on the 128-lane axis,
    so XLA lowers the conv onto the MXU as an implicit matmul.
  * the streaming path (reference rnnt/causalconv.py:32-40) is a pure
    function ``(params, x, state) -> (y, new_state)``; carry states are
    plain arrays that live in a pytree and stay on device between chunks.
  * all shapes static; stride/dilation/kernel come in via a hashable
    ``ConvSpec`` so they are trace-time constants under ``jit``.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class ConvSpec(NamedTuple):
    """Static (trace-time) description of one causal conv layer."""

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    # Bounded future lookahead, subtracted from the left pad.  Must satisfy
    # 0 <= additional_context <= (k-1)*d - s + 1.
    additional_context: int = 0

    @property
    def padding(self) -> int:
        """Total causal pad: output t sees inputs <= t when this is all-left."""
        return (self.kernel_size - 1) * self.dilation - self.stride + 1

    @property
    def left_padding(self) -> int:
        return self.padding - self.additional_context

    def validate(self) -> "ConvSpec":
        if self.additional_context < 0:
            raise ValueError("additional_context must be non-negative")
        if self.additional_context > self.padding:
            raise ValueError("additional_context can't exceed the causal padding")
        return self


def causal_conv_state_len(spec: ConvSpec) -> int:
    """Length of the streaming carry state: (k-1)*d - s + 1 frames."""
    return spec.padding


def causal_conv_out_len(in_len, spec: ConvSpec):
    """Output length for a given input length (batch mode).

    Mirrors the conv length arithmetic the reference replays in
    rnnt/jasper.py:172-183.  Works on ints or integer arrays.
    """
    numer = in_len + spec.left_padding - spec.dilation * (spec.kernel_size - 1) - 1
    return numer // spec.stride + 1


def causal_conv_init(key: jax.Array, spec: ConvSpec, dtype=jnp.float32) -> dict:
    """Kaiming-uniform init (bound 1/sqrt(fan_in)), weight layout (K, Cin, Cout)."""
    spec.validate()
    wkey, bkey = jax.random.split(key)
    fan_in = spec.in_channels * spec.kernel_size
    bound = 1.0 / math.sqrt(fan_in)
    w = jax.random.uniform(
        wkey, (spec.kernel_size, spec.in_channels, spec.out_channels),
        minval=-bound, maxval=bound, dtype=dtype)
    b = jax.random.uniform(
        bkey, (spec.out_channels,), minval=-bound, maxval=bound, dtype=dtype)
    return {"w": w, "b": b}


def _conv(x: jax.Array, w: jax.Array, b: jax.Array, spec: ConvSpec,
          padding) -> jax.Array:
    # No preferred_element_type here: its transpose rule mixes the f32
    # cotangent with bf16 weights and fails; XLA's TPU conv accumulates in
    # f32 internally for bf16 inputs anyway.
    y = lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(spec.stride,),
        padding=padding,
        rhs_dilation=(spec.dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
    )
    y = y + b.astype(y.dtype)
    return y.astype(x.dtype)


def causal_conv_apply(params: dict, x: jax.Array, spec: ConvSpec) -> jax.Array:
    """Batch-mode forward.  x: (B, T, Cin) -> (B, T', Cout).

    Left-pads with zeros only (reference rnnt/causalconv.py:26-30: right
    padding is never valid because the future is unknown).
    """
    return _conv(x, params["w"], params["b"], spec,
                 padding=[(spec.left_padding, 0)])


def causal_conv_streaming(params: dict, x: jax.Array, state: jax.Array,
                          spec: ConvSpec) -> tuple[jax.Array, jax.Array]:
    """Streaming forward.  Concatenate carry state, convolve valid-only, keep
    the tail as the new state (reference rnnt/causalconv.py:32-40).

    x: (B, chunk, Cin); state: (B, state_len, Cin) with
    state_len = (k-1)*d - s + 1.  Chunk lengths must keep
    (state_len + chunk) producing >= 0 output frames; the new state length
    equals the old one whenever chunk % stride == 0.
    """
    full = jnp.concatenate([state, x], axis=1)
    y = _conv(full, params["w"], params["b"], spec, padding=[(0, 0)])
    consumed = y.shape[1] * spec.stride
    new_state = full[:, consumed:, :]
    return y, new_state


def streaming_init_state(batch_size: int, spec: ConvSpec,
                         dtype=jnp.float32) -> jax.Array:
    """Zero carry state sized (B, (k-1)*d - s + 1, Cin)
    (reference rnnt/jasper.py:159-170)."""
    return jnp.zeros((batch_size, causal_conv_state_len(spec), spec.in_channels),
                     dtype=dtype)


# -- 1x1 convolution == per-frame linear; used for residual and output convs --

def conv1x1_init(key: jax.Array, in_channels: int, out_channels: int,
                 dtype=jnp.float32) -> dict:
    wkey, bkey = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_channels)
    w = jax.random.uniform(wkey, (in_channels, out_channels),
                           minval=-bound, maxval=bound, dtype=dtype)
    b = jax.random.uniform(bkey, (out_channels,),
                           minval=-bound, maxval=bound, dtype=dtype)
    return {"w": w, "b": b}


def conv1x1_apply(params: dict, x: jax.Array) -> jax.Array:
    """x: (..., Cin) -> (..., Cout).  A plain MXU matmul."""
    y = jnp.dot(x, params["w"].astype(x.dtype),
                preferred_element_type=jnp.float32)
    y = y + params["b"].astype(jnp.float32)
    return y.astype(x.dtype)
