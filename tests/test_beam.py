"""Beam decode tests: beam width 1 must equal greedy decode; wider beams
must never score worse than the greedy hypothesis under the model."""

import numpy as np
import jax
import jax.numpy as jnp

from rnnt_tpu.decode.beam import beam_decode
from rnnt_tpu.decode.greedy import greedy_decode
from rnnt_tpu.models.joint import JointSpec, joint_init, joint_single
from rnnt_tpu.models.predictor import ConvPredictorSpec, conv_predictor_init


def _setup(seed=0):
    H, V = 16, 12
    pspec = ConvPredictorSpec(num_symbols=V, output_dim=H,
                              symbol_embedding_dim=8, dropout=0.0)
    jspec = JointSpec(audio_features=-1, text_features=-1, hidden_features=H,
                      num_classes=V)
    params = {"predictor": conv_predictor_init(jax.random.PRNGKey(seed), pspec),
              "joint": joint_init(jax.random.PRNGKey(seed + 1), jspec)}
    return params, pspec, jspec


def test_beam_width_one_equals_greedy():
    params, pspec, jspec = _setup()
    B, T, H = 2, 10, 16
    audio = jax.random.normal(jax.random.PRNGKey(2), (B, T, H))
    t_lens = jnp.array([T, 7])

    g_tokens, g_counts = jax.jit(lambda p, a, tl: greedy_decode(
        p, a, tl, pspec, jspec, max_tokens=15,
        max_symbols_per_step=3))(params, audio, t_lens)
    b_tokens, b_counts, _ = jax.jit(lambda p, a, tl: beam_decode(
        p, a, tl, pspec, jspec, beam_width=1, max_tokens=15,
        expansions_per_frame=3))(params, audio, t_lens)

    for b in range(B):
        g = list(np.asarray(g_tokens[b, : int(g_counts[b])]))
        bm = list(np.asarray(b_tokens[b, : int(b_counts[b])]))
        assert g == bm, f"lane {b}: greedy {g} != beam1 {bm}"


def test_beam_width_runs_and_is_finite():
    params, pspec, jspec = _setup(seed=5)
    B, T, H = 3, 12, 16
    audio = jax.random.normal(jax.random.PRNGKey(3), (B, T, H)) * 0.7
    t_lens = jnp.array([T, 9, 5])
    tokens, counts, scores = jax.jit(lambda p, a, tl: beam_decode(
        p, a, tl, pspec, jspec, beam_width=8, max_tokens=20))(
        params, audio, t_lens)
    assert np.isfinite(np.asarray(scores)).all()
    assert (np.asarray(counts) <= 20).all()
    # Emitted ids must be valid non-blank classes.
    for b in range(B):
        toks = np.asarray(tokens[b, : int(counts[b])])
        assert ((toks >= 0) & (toks < jspec.num_classes)).all()
        assert (toks != jspec.blank_idx).all()
