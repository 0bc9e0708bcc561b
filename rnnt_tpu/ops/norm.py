"""Normalization layers as pure functions over (B, T, C) arrays.

Parity targets (reference rnnt/jasper.py:9-14,29-44): the encoder selects
between batch norm, instance norm, and affine instance norm; instance norms
run with ``track_running_stats=False`` so streaming chunks are normalized
with their own statistics.  Batch norm carries running statistics which make
it the streaming-exact choice at inference (reference's fullcausal config).

All statistics are computed in float32 regardless of the activation dtype.
Batch norm's running stats are explicit state threaded through the train
step — there are no mutable modules here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-5
_MOMENTUM = 0.1  # torch BatchNorm default: new = (1-m)*old + m*batch


def norm_init(num_channels: int, norm_type: str, dtype=jnp.float32):
    """Returns (params, state).  state is {} except for batch norm."""
    if norm_type == "batch":
        params = {"scale": jnp.ones((num_channels,), dtype),
                  "bias": jnp.zeros((num_channels,), dtype)}
        state = {"mean": jnp.zeros((num_channels,), jnp.float32),
                 "var": jnp.ones((num_channels,), jnp.float32)}
    elif norm_type == "instance":
        params, state = {}, {}
    elif norm_type == "instance_affine":
        params = {"scale": jnp.ones((num_channels,), dtype),
                  "bias": jnp.zeros((num_channels,), dtype)}
        state = {}
    else:
        raise ValueError(f"unknown norm_type: {norm_type}")
    return params, state


def norm_apply(params: dict, state: dict, x: jax.Array, norm_type: str,
               training: bool) -> tuple[jax.Array, dict]:
    """Apply the selected norm.  x: (B, T, C).  Returns (y, new_state)."""
    xf = x.astype(jnp.float32)
    if norm_type == "batch":
        if training:
            mean = jnp.mean(xf, axis=(0, 1))
            var = jnp.var(xf, axis=(0, 1))
            n = x.shape[0] * x.shape[1]
            # torch tracks the unbiased variance in running stats.
            unbiased = var * (n / max(n - 1, 1))
            new_state = {
                "mean": (1 - _MOMENTUM) * state["mean"] + _MOMENTUM * mean,
                "var": (1 - _MOMENTUM) * state["var"] + _MOMENTUM * unbiased,
            }
        else:
            mean, var = state["mean"], state["var"]
            new_state = state
        y = (xf - mean) * jax.lax.rsqrt(var + _EPS)
        y = y * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
        return y.astype(x.dtype), new_state

    # Instance norms: per-sample, per-channel statistics over the time axis.
    mean = jnp.mean(xf, axis=1, keepdims=True)
    var = jnp.var(xf, axis=1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + _EPS)
    if norm_type == "instance_affine":
        y = y * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return y.astype(x.dtype), state


def layer_norm_init(num_features: int, dtype=jnp.float32) -> dict:
    return {"scale": jnp.ones((num_features,), dtype),
            "bias": jnp.zeros((num_features,), dtype)}


def layer_norm_apply(params: dict, x: jax.Array) -> jax.Array:
    """LayerNorm over the trailing feature axis (torch semantics, eps 1e-5)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + _EPS)
    y = y * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return y.astype(x.dtype)
