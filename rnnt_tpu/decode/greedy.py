"""Greedy transducer decode as one jitted, batched `lax.while_loop`.

Capability parity with the reference's greedy decode
(reference rnnt/model.py:45-139): time-synchronous loop, at most
``max_symbols_per_step`` (10) emissions per frame, blank advances time,
LSTM predictor reuses state (rnnt/model.py:80-82), conv predictor has a
finite receptive field (rnnt/model.py:121-123).

TPU-native design (the antithesis of the reference's per-token Python
loop, which SURVEY.md flags as the thing to replace):

* one fixed-shape `lax.while_loop` decodes a whole *batch* of utterances
  (the reference asserts batch_size == 1, rnnt/model.py:47,91); each lane
  carries its own time pointer and freezes when done.
* the conv predictor's incremental step evaluates a masked
  ``receptive_field``-token window with *valid* (unpadded) convs — exactly
  equal to re-running the full predictor, including the zero-left-padding
  semantics for histories shorter than the window, at O(1) cost per step.
* everything is static-shape: tokens land in a preallocated (B, max_tokens)
  buffer.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from rnnt_tpu.models.joint import joint_window
from rnnt_tpu.models.predictor import (
    ConvPredictorSpec,
    LSTMPredictorSpec,
    lstm_predictor_init_state,
)
from rnnt_tpu.ops.norm import layer_norm_apply


# ---------------------- incremental predictor steps ----------------------

def _conv_window_features(params, window: jax.Array, valid: jax.Array,
                          spec: ConvPredictorSpec) -> jax.Array:
    """Feature at the last position of a right-aligned token window.

    window: (B, R) int token ids, most recent last; valid: (B,) number of
    valid trailing positions (>=1).  Invalid leading positions are zeroed
    *after* embedding+LN, reproducing the causal conv's zero left-padding
    for short histories.  Convs run unpadded so the single surviving output
    is exactly the full-sequence feature at the last position.
    """
    from jax import lax as _lax

    R = spec.receptive_field
    x = params["embedding"][window]
    x = layer_norm_apply(params["input_ln"], x)

    def seq_mask(xx, offset):
        # Window position p (= offset + within-array index) is a real
        # sequence position iff p >= R - valid; everything earlier must be
        # exactly zero — that is what the causal conv's left-pad feeds the
        # next conv in the full-sequence run.
        pos = offset + jnp.arange(xx.shape[1])[None, :]
        mask = pos >= (R - valid[:, None])
        return jnp.where(mask[:, :, None], xx, 0.0)

    def valid_conv(p, xx):
        y = _lax.conv_general_dilated(
            xx, p["w"].astype(xx.dtype), window_strides=(1,), padding=[(0, 0)],
            dimension_numbers=("NHC", "HIO", "NHC"))
        return (y + p["b"].astype(y.dtype)).astype(xx.dtype)

    x = seq_mask(x, 0)
    x = jax.nn.gelu(valid_conv(params["conv1"], x), approximate=False)      # (B, R-2, D) @ pos 2..
    x = seq_mask(x, 2)
    x = jax.nn.gelu(valid_conv(params["conv2"], x), approximate=False)      # (B, R-6, D) @ pos 6
    x = x[:, -1, :]
    y = jnp.dot(x, params["linear"]["w"].astype(x.dtype),
                preferred_element_type=jnp.float32)
    y = (y + params["linear"]["b"].astype(jnp.float32)).astype(x.dtype)
    return layer_norm_apply(params["output_ln"], y)


def _lstm_step(params, token: jax.Array, state, spec: LSTMPredictorSpec):
    """Single-token LSTM predictor step: (B,) int -> ((B, D), new_state)."""
    from rnnt_tpu.models.predictor import lstm_predictor_apply

    feats, new_state = lstm_predictor_apply(params, token[:, None], spec,
                                            state=state)
    return feats[:, 0, :], new_state


def _make_predictor_stepper(params, spec, blank_idx: int, batch: int):
    """Returns (feat0, state0, step_fn) where
    step_fn(state, token (B,)) -> (feat (B, D), new_state)."""
    if isinstance(spec, ConvPredictorSpec):
        R = spec.receptive_field
        window0 = jnp.full((batch, R), blank_idx, dtype=jnp.int32)
        valid0 = jnp.ones((batch,), jnp.int32)
        feat0 = _conv_window_features(params, window0, valid0, spec)
        state0 = (window0, valid0)

        def step(state, token):
            window, valid = state
            window = jnp.concatenate(
                [window[:, 1:], token[:, None].astype(jnp.int32)], axis=1)
            valid = jnp.minimum(valid + 1, R)
            return _conv_window_features(params, window, valid, spec), (window, valid)

        return feat0, state0, step

    if isinstance(spec, LSTMPredictorSpec):
        lstm0 = lstm_predictor_init_state(batch, spec)
        feat0, state0 = _lstm_step(
            params, jnp.full((batch,), blank_idx, jnp.int32), lstm0, spec)

        def step(state, token):
            return _lstm_step(params, token.astype(jnp.int32), state, spec)

        return feat0, state0, step

    raise TypeError(f"unknown predictor spec: {type(spec)}")


# ------------------------------ greedy loop ------------------------------

class _Loop(NamedTuple):
    t: jax.Array            # (B,) current frame per lane
    n: jax.Array            # (B,) emitted token count per lane
    emits: jax.Array        # (B,) emissions at the current frame
    tokens: jax.Array       # (B, max_tokens)
    pred_feat: jax.Array    # (B, D)
    pred_state: tuple


def decode_init_carry(params, predictor_spec, joint_spec, batch: int):
    """Initial cross-chunk decode carry (pred_feat, pred_state) for
    incremental/streaming decoding (reference rnnt-js/decoder.js:57-100
    persists the analogous state between chunks)."""
    feat0, pstate0, _ = _make_predictor_stepper(
        params["predictor"], predictor_spec, joint_spec.blank_idx, batch)
    return feat0, pstate0


def greedy_decode(params, audio: jax.Array, t_lens: jax.Array,
                  predictor_spec, joint_spec, *, max_tokens: int = 200,
                  max_symbols_per_step: int = 10, carry=None,
                  frames_per_step: int = 8):
    """Batched greedy decode over encoder output.

    params: {"predictor": ..., "joint": ...}; audio: (B, T, H) encoder
    features; t_lens: (B,) valid frame counts.  Returns
    (tokens (B, max_tokens) int32, counts (B,) int32) — tokens[b, :counts[b]]
    is the hypothesis (the warm-up blank is never stored, matching the
    reference's ``tokens[1:]`` return, rnnt/model.py:87).

    Pass ``carry`` (from ``decode_init_carry`` or a previous call's third
    return value via ``greedy_decode_incremental``) to continue a stream.
    """
    tokens, counts, _ = greedy_decode_incremental(
        params, audio, t_lens, predictor_spec, joint_spec,
        max_tokens=max_tokens, max_symbols_per_step=max_symbols_per_step,
        carry=carry, frames_per_step=frames_per_step)
    return tokens, counts


def greedy_decode_incremental(params, audio: jax.Array, t_lens: jax.Array,
                              predictor_spec, joint_spec, *,
                              max_tokens: int = 200,
                              max_symbols_per_step: int = 10, carry=None,
                              frames_per_step: int = 8):
    """Like ``greedy_decode`` but also returns the cross-chunk carry so a
    streaming session can continue where this chunk left off.

    ``frames_per_step`` (W) is the blank-skip window: each while-loop
    iteration scores W consecutive frames against the current predictor
    feature in ONE batched joint matmul (``joint_window``) and either
    emits at the first non-blank frame or skips the whole window.  The
    result is bit-identical to W=1 (the reference's frame-at-a-time loop,
    rnnt/model.py:108-125) because a greedy emission only depends on the
    predictor state, which is unchanged across a run of blanks — but the
    loop runs ~W× fewer iterations on blank-dominated audio and feeds the
    MXU W× larger matmuls."""
    B, T, _ = audio.shape
    W = max(1, min(frames_per_step, T))
    blank = joint_spec.blank_idx
    feat0, pstate0, pred_step = _make_predictor_stepper(
        params["predictor"], predictor_spec, blank, B)
    if carry is not None:
        feat0, pstate0 = carry

    init = _Loop(
        t=jnp.zeros((B,), jnp.int32),
        n=jnp.zeros((B,), jnp.int32),
        emits=jnp.zeros((B,), jnp.int32),
        tokens=jnp.full((B, max_tokens), blank, jnp.int32),
        pred_feat=feat0,
        pred_state=pstate0,
    )

    t_lens = t_lens.astype(jnp.int32)

    def active(s: _Loop):
        return (s.t < t_lens) & (s.n < max_tokens)

    def cond(s: _Loop):
        return jnp.any(active(s))

    def body(s: _Loop) -> _Loop:
        act = active(s)
        # Window of W frames starting at each lane's time pointer.
        pos = s.t[:, None] + jnp.arange(W, dtype=jnp.int32)[None, :]   # (B, W)
        frames = jnp.take_along_axis(
            audio, jnp.clip(pos, 0, T - 1)[:, :, None], axis=1)        # (B, W, H)
        logits = joint_window(params["joint"], frames, s.pred_feat)    # (B, W, V)
        tok_w = jnp.argmax(logits, axis=-1).astype(jnp.int32)          # (B, W)

        # Out-of-range frames act as blank (they only advance time); the
        # per-frame emission cap forces the *current* frame blank once hit —
        # later window frames reset the counter by skipping, so only w=0
        # can be at the cap.
        is_blank_w = (tok_w == blank) | (pos >= t_lens[:, None])
        at_cap = s.emits >= max_symbols_per_step
        is_blank_w = is_blank_w.at[:, 0].set(is_blank_w[:, 0] | at_cap)

        nonblank = ~is_blank_w
        all_blank = ~jnp.any(nonblank, axis=1)                         # (B,)
        p = jnp.argmax(nonblank, axis=1).astype(jnp.int32)             # (B,)
        tok = jnp.take_along_axis(tok_w, p[:, None], axis=1)[:, 0]

        emit = act & ~all_blank
        # Emitting lanes park at the emitting frame (t+p); blank-only
        # windows (and frozen lanes, harmlessly) jump the whole window.
        new_t = jnp.where(emit, s.t + p, s.t + W)
        # p frames of blank reset the cap counter before the emission.
        new_emits = jnp.where(emit, jnp.where(p == 0, s.emits + 1, 1), 0)
        tokens = s.tokens.at[jnp.arange(B), jnp.clip(s.n, 0, max_tokens - 1)].set(
            jnp.where(emit, tok, s.tokens[jnp.arange(B),
                                          jnp.clip(s.n, 0, max_tokens - 1)]))
        new_n = jnp.where(emit, s.n + 1, s.n)

        # Predictor step only matters for emitting lanes; frozen elsewhere.
        stepped_feat, stepped_state = pred_step(s.pred_state, tok)
        pred_feat = jnp.where(emit[:, None], stepped_feat, s.pred_feat)
        pred_state = jax.tree.map(
            lambda new, old: jnp.where(
                emit.reshape((B,) + (1,) * (new.ndim - 1)), new, old),
            stepped_state, s.pred_state)

        return _Loop(new_t, new_n, new_emits, tokens, pred_feat, pred_state)

    final = lax.while_loop(cond, body, init)
    return final.tokens, final.n, (final.pred_feat, final.pred_state)
