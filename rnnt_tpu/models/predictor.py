"""RNN-T prediction (text-side) networks: conv and layer-normed LSTM.

Capability parity with the reference predictors (reference
rnnt/predictor.py:11-228):

* ``ConvPredictor`` — embedding → LayerNorm → CausalConv(k=3) → GELU →
  dropout → CausalConv(k=5) → GELU → dropout → Linear → LayerNorm.
  Stateless with a finite receptive field (7 tokens), which is what makes
  O(1) incremental decode possible.
* ``LSTMPredictor`` — embedding → LayerNorm → N custom layer-normed LSTM
  layers → Linear → LayerNorm, carrying explicit (h, c) state per layer.

TPU-native design: the LSTM input projection ``x2g`` is hoisted out of the
recurrence as one big MXU matmul over the whole sequence; the recurrence
itself is a `lax.scan` (the reference unrolls a Python loop per step,
rnnt/predictor.py:74-85).  The conv predictor exposes a fixed-window
``window_apply`` so jitted decode updates cost O(1) per emitted token
instead of the reference's full re-run (rnnt/model.py:121-123).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax import lax

from rnnt_tpu.ops.causal_conv import (
    ConvSpec,
    causal_conv_apply,
    causal_conv_init,
)
from rnnt_tpu.ops.norm import layer_norm_apply, layer_norm_init


@dataclass(frozen=True)
class ConvPredictorSpec:
    num_symbols: int
    output_dim: int
    symbol_embedding_dim: int
    dropout: float = 0.0

    @property
    def conv1_spec(self) -> ConvSpec:
        d = self.symbol_embedding_dim
        return ConvSpec(d, d, kernel_size=3, stride=1, dilation=1)

    @property
    def conv2_spec(self) -> ConvSpec:
        d = self.symbol_embedding_dim
        return ConvSpec(d, d, kernel_size=5, stride=1, dilation=1)

    @property
    def receptive_field(self) -> int:
        """Tokens of context needed for one output position: (3-1)+(5-1)+1."""
        return 7


@dataclass(frozen=True)
class LSTMPredictorSpec:
    num_symbols: int
    output_dim: int
    symbol_embedding_dim: int
    num_lstm_layers: int
    lstm_hidden_dim: int
    lstm_layer_norm: bool = False
    lstm_layer_norm_epsilon: float = 1e-5
    lstm_dropout: float = 0.0


def _linear_init(key, in_dim, out_dim, bias=True, dtype=jnp.float32):
    wkey, bkey = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_dim)
    p = {"w": jax.random.uniform(wkey, (in_dim, out_dim), minval=-bound,
                                 maxval=bound, dtype=dtype)}
    if bias:
        p["b"] = jax.random.uniform(bkey, (out_dim,), minval=-bound,
                                    maxval=bound, dtype=dtype)
    return p


def _linear(p, x):
    y = jnp.dot(x, p["w"].astype(x.dtype), preferred_element_type=jnp.float32)
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y.astype(x.dtype)


def _dropout(x, rate, training, rng):
    """uint16 threshold-mask dropout (see models/encoder.py _dropout)."""
    if not training or rate == 0.0 or rng is None:
        return x
    thresh = int(round((1.0 - rate) * 65536.0))
    keep = thresh / 65536.0
    bits = jax.random.bits(rng, x.shape, jnp.uint16)
    return jnp.where(bits < thresh, x * (1.0 / keep), 0.0).astype(x.dtype)


# ------------------------------ conv predictor ------------------------------

def conv_predictor_init(key: jax.Array, spec: ConvPredictorSpec, dtype=jnp.float32):
    k = jax.random.split(key, 4)
    return {
        "embedding": jax.random.normal(
            k[0], (spec.num_symbols, spec.symbol_embedding_dim), dtype),
        "input_ln": layer_norm_init(spec.symbol_embedding_dim, dtype),
        "conv1": causal_conv_init(k[1], spec.conv1_spec, dtype),
        "conv2": causal_conv_init(k[2], spec.conv2_spec, dtype),
        "linear": _linear_init(k[3], spec.symbol_embedding_dim, spec.output_dim,
                               dtype=dtype),
        "output_ln": layer_norm_init(spec.output_dim, dtype),
    }


def conv_predictor_apply(params, tokens: jax.Array, spec: ConvPredictorSpec, *,
                         training: bool = False, rng: jax.Array | None = None):
    """tokens: int (B, U) -> features (B, U, output_dim)."""
    r1 = r2 = None
    if rng is not None:
        r1, r2 = jax.random.split(rng)
    x = params["embedding"][tokens]
    x = layer_norm_apply(params["input_ln"], x)
    x = causal_conv_apply(params["conv1"], x, spec.conv1_spec)
    x = jax.nn.gelu(x, approximate=False)
    x = _dropout(x, spec.dropout, training, r1)
    x = causal_conv_apply(params["conv2"], x, spec.conv2_spec)
    x = jax.nn.gelu(x, approximate=False)
    x = _dropout(x, spec.dropout, training, r2)
    x = _linear(params["linear"], x)
    x = layer_norm_apply(params["output_ln"], x)
    return x


def conv_predictor_window_apply(params, window: jax.Array,
                                spec: ConvPredictorSpec) -> jax.Array:
    """Incremental decode step: ``window`` is the last ``receptive_field``
    tokens (B, 7); returns the predictor feature for the *last* position
    (B, output_dim).  Equivalent to ``conv_predictor_apply(...)[:, -1]``.
    """
    feats = conv_predictor_apply(params, window, spec)
    return feats[:, -1, :]


# ------------------------------ LSTM predictor ------------------------------

def _lstm_layer_init(key, input_dim, hidden_dim, layer_norm, dtype):
    k1, k2 = jax.random.split(key)
    p = {
        "x2g": _linear_init(k1, input_dim, 4 * hidden_dim, bias=not layer_norm,
                            dtype=dtype),
        "p2g": _linear_init(k2, hidden_dim, 4 * hidden_dim, bias=False,
                            dtype=dtype),
    }
    if layer_norm:
        p["c_norm"] = layer_norm_init(hidden_dim, dtype)
        p["g_norm"] = layer_norm_init(4 * hidden_dim, dtype)
    return p


def lstm_predictor_init(key: jax.Array, spec: LSTMPredictorSpec, dtype=jnp.float32):
    keys = jax.random.split(key, spec.num_lstm_layers + 3)
    layers = []
    for i in range(spec.num_lstm_layers):
        in_dim = spec.symbol_embedding_dim if i == 0 else spec.lstm_hidden_dim
        layers.append(_lstm_layer_init(keys[i], in_dim, spec.lstm_hidden_dim,
                                       spec.lstm_layer_norm, dtype))
    return {
        "embedding": jax.random.normal(
            keys[-3], (spec.num_symbols, spec.symbol_embedding_dim), dtype),
        "input_ln": layer_norm_init(spec.symbol_embedding_dim, dtype),
        "layers": layers,
        "linear": _linear_init(keys[-2], spec.lstm_hidden_dim, spec.output_dim,
                               dtype=dtype),
        "output_ln": layer_norm_init(spec.output_dim, dtype),
    }


def lstm_predictor_init_state(batch_size: int, spec: LSTMPredictorSpec,
                              dtype=jnp.float32):
    """Zero (h, c) per layer: tuple of (num_layers) dicts."""
    return tuple(
        {"h": jnp.zeros((batch_size, spec.lstm_hidden_dim), dtype),
         "c": jnp.zeros((batch_size, spec.lstm_hidden_dim), dtype)}
        for _ in range(spec.num_lstm_layers))


def _lstm_layer_apply(p, x, state, spec: LSTMPredictorSpec):
    """x: (B, U, D) -> (B, U, H).  Recurrence via lax.scan; gate input
    projection hoisted to one MXU matmul over the whole sequence."""
    gated = _linear(p["x2g"], x)  # (B, U, 4H)

    def step(carry, g_t):
        h, c = carry
        gates = g_t + _linear(p["p2g"], h)
        if "g_norm" in p:
            gates = layer_norm_apply(p["g_norm"], gates)
        i_g, f_g, c_g, o_g = jnp.split(gates, 4, axis=-1)
        i_g = jax.nn.sigmoid(i_g)
        f_g = jax.nn.sigmoid(f_g)
        c_g = jnp.tanh(c_g)
        o_g = jax.nn.sigmoid(o_g)
        c = f_g * c + i_g * c_g
        if "c_norm" in p:
            c = layer_norm_apply(p["c_norm"], c)
        h = o_g * jnp.tanh(c)
        return (h, c), h

    (h, c), hs = lax.scan(step, (state["h"], state["c"]),
                          jnp.swapaxes(gated, 0, 1))
    return jnp.swapaxes(hs, 0, 1), {"h": h, "c": c}


def lstm_predictor_apply(params, tokens: jax.Array, spec: LSTMPredictorSpec, *,
                         state=None, training: bool = False,
                         rng: jax.Array | None = None):
    """tokens: (B, U) -> (features (B, U, output_dim), new_state)."""
    if state is None:
        state = lstm_predictor_init_state(tokens.shape[0], spec)
    x = params["embedding"][tokens]
    x = layer_norm_apply(params["input_ln"], x)
    new_state = []
    for li, lp in enumerate(params["layers"]):
        x, s = _lstm_layer_apply(lp, x, state[li], spec)
        lrng = None
        if rng is not None:
            rng, lrng = jax.random.split(rng)
        x = _dropout(x, spec.lstm_dropout, training, lrng)
        new_state.append(s)
    x = _linear(params["linear"], x)
    x = layer_norm_apply(params["output_ln"], x)
    return x, tuple(new_state)


# ------------------------------ dispatch helpers ------------------------------

def predictor_init(key, spec, dtype=jnp.float32):
    if isinstance(spec, ConvPredictorSpec):
        return conv_predictor_init(key, spec, dtype)
    if isinstance(spec, LSTMPredictorSpec):
        return lstm_predictor_init(key, spec, dtype)
    raise TypeError(f"unknown predictor spec: {type(spec)}")


def predictor_apply(params, tokens, spec, *, training=False, rng=None):
    """Full-sequence apply used by the training lattice; returns features
    only (state handling is decode-path concern)."""
    if isinstance(spec, ConvPredictorSpec):
        return conv_predictor_apply(params, tokens, spec, training=training, rng=rng)
    if isinstance(spec, LSTMPredictorSpec):
        feats, _ = lstm_predictor_apply(params, tokens, spec, training=training, rng=rng)
        return feats
    raise TypeError(f"unknown predictor spec: {type(spec)}")
