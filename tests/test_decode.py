"""Greedy decode tests: the jitted batched while_loop must match a plain
Python reimplementation of the reference's per-token loop
(reference rnnt/model.py:89-128) exactly, token for token.
"""

import numpy as np
import jax
import jax.numpy as jnp

from rnnt_tpu.decode.greedy import greedy_decode
from rnnt_tpu.models.joint import JointSpec, joint_init, joint_single
from rnnt_tpu.models.predictor import (
    ConvPredictorSpec,
    LSTMPredictorSpec,
    conv_predictor_apply,
    conv_predictor_init,
    lstm_predictor_apply,
    lstm_predictor_init,
)


def _python_greedy_conv(params, audio_b, t_len, pspec, jspec, max_tokens,
                        max_per_step=10):
    """Reference-semantics loop: full predictor re-run per emission
    (rnnt/model.py:89-128)."""
    blank = jspec.blank_idx
    tokens = [blank]
    t, emits = 0, 0
    feats = conv_predictor_apply(params["predictor"],
                                 jnp.asarray([tokens]), pspec)
    while t < t_len and len(tokens) - 1 < max_tokens:
        logits = joint_single(params["joint"], audio_b[None, t],
                              feats[:, -1, :])
        tok = int(jnp.argmax(logits[0]))
        if tok == blank or emits >= max_per_step:
            t += 1
            emits = 0
        else:
            tokens.append(tok)
            feats = conv_predictor_apply(params["predictor"],
                                         jnp.asarray([tokens]), pspec)
            emits += 1
    return tokens[1:]


def _python_greedy_lstm(params, audio_b, t_len, pspec, jspec, max_tokens,
                        max_per_step=10):
    blank = jspec.blank_idx
    tokens = [blank]
    t, emits = 0, 0
    feats, state = lstm_predictor_apply(params["predictor"],
                                        jnp.asarray([[blank]]), pspec)
    while t < t_len and len(tokens) - 1 < max_tokens:
        logits = joint_single(params["joint"], audio_b[None, t],
                              feats[:, -1, :])
        tok = int(jnp.argmax(logits[0]))
        if tok == blank or emits >= max_per_step:
            t += 1
            emits = 0
        else:
            tokens.append(tok)
            feats, state = lstm_predictor_apply(
                params["predictor"], jnp.asarray([[tok]]), pspec, state=state)
            emits += 1
    return tokens[1:]


def _setup(pspec_kind):
    H, V = 16, 12
    if pspec_kind == "conv":
        pspec = ConvPredictorSpec(num_symbols=V, output_dim=H,
                                  symbol_embedding_dim=8, dropout=0.0)
        pparams = conv_predictor_init(jax.random.PRNGKey(0), pspec)
    else:
        pspec = LSTMPredictorSpec(num_symbols=V, output_dim=H,
                                  symbol_embedding_dim=8, num_lstm_layers=1,
                                  lstm_hidden_dim=12, lstm_layer_norm=True)
        pparams = lstm_predictor_init(jax.random.PRNGKey(0), pspec)
    jspec = JointSpec(audio_features=-1, text_features=-1, hidden_features=H,
                      num_classes=V)
    jparams = joint_init(jax.random.PRNGKey(1), jspec)
    return {"predictor": pparams, "joint": jparams}, pspec, jspec


def test_greedy_conv_matches_python_reference():
    params, pspec, jspec = _setup("conv")
    B, T, H = 3, 12, 16
    audio = jax.random.normal(jax.random.PRNGKey(2), (B, T, H))
    t_lens = jnp.array([T, T - 4, 5])

    tokens, counts = jax.jit(
        lambda p, a, tl: greedy_decode(p, a, tl, pspec, jspec, max_tokens=20)
    )(params, audio, t_lens)

    for b in range(B):
        ref = _python_greedy_conv(params, audio[b], int(t_lens[b]), pspec,
                                  jspec, 20)
        got = list(np.asarray(tokens[b, :int(counts[b])]))
        assert got == ref, f"lane {b}: {got} != {ref}"


def test_greedy_lstm_matches_python_reference():
    params, pspec, jspec = _setup("lstm")
    B, T, H = 2, 10, 16
    audio = jax.random.normal(jax.random.PRNGKey(3), (B, T, H))
    t_lens = jnp.array([T, 7])

    tokens, counts = jax.jit(
        lambda p, a, tl: greedy_decode(p, a, tl, pspec, jspec, max_tokens=15)
    )(params, audio, t_lens)

    for b in range(B):
        ref = _python_greedy_lstm(params, audio[b], int(t_lens[b]), pspec,
                                  jspec, 15)
        got = list(np.asarray(tokens[b, :int(counts[b])]))
        assert got == ref, f"lane {b}: {got} != {ref}"


def test_blank_skip_window_sizes_agree():
    """The blank-skip window (frames_per_step=W) must be a pure speed knob:
    identical tokens AND counts for W=1 (the reference's frame-at-a-time
    semantics), a non-divisor W=3 (window straddles t_len boundaries), and
    the default W=8 (window wider than some utterances)."""
    params, pspec, jspec = _setup("conv")
    B, T, H = 4, 13, 16
    audio = jax.random.normal(jax.random.PRNGKey(5), (B, T, H))
    t_lens = jnp.array([T, 6, 1, 11])

    outs = {}
    for w in (1, 3, 8):
        outs[w] = jax.jit(
            lambda p, a, tl, w=w: greedy_decode(
                p, a, tl, pspec, jspec, max_tokens=20, frames_per_step=w)
        )(params, audio, t_lens)
    for w in (3, 8):
        np.testing.assert_array_equal(np.asarray(outs[1][0]),
                                      np.asarray(outs[w][0]))
        np.testing.assert_array_equal(np.asarray(outs[1][1]),
                                      np.asarray(outs[w][1]))


def test_max_tokens_cap():
    params, pspec, jspec = _setup("conv")
    audio = jax.random.normal(jax.random.PRNGKey(4), (1, 30, 16)) * 3
    tokens, counts = greedy_decode(params, audio, jnp.array([30]), pspec,
                                   jspec, max_tokens=5)
    assert int(counts[0]) <= 5
