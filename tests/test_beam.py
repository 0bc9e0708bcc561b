"""Beam decode tests: beam width 1 must equal greedy decode; wider beams
must never score worse than the greedy hypothesis under the model."""

import numpy as np
import jax
import jax.numpy as jnp

from rnnt_tpu.decode.beam import beam_decode, merge_duplicate_scores
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


def test_merge_duplicate_scores_unit():
    blank = 11
    # Lanes 0 and 2 hold the same history [3, 5]; lane 1 differs; lane 3 dead.
    tokens = jnp.full((1, 4, 6), blank, jnp.int32)
    tokens = tokens.at[0, 0, :2].set(jnp.array([3, 5]))
    tokens = tokens.at[0, 1, :2].set(jnp.array([3, 7]))
    tokens = tokens.at[0, 2, :2].set(jnp.array([3, 5]))
    n = jnp.array([[2, 2, 2, 0]], jnp.int32)
    score = jnp.array([[-1.0, -2.0, -1.5, -1e30]], jnp.float32)

    out = np.asarray(merge_duplicate_scores(tokens, n, score))[0]
    assert np.isclose(out[0], np.logaddexp(-1.0, -1.5)), out
    assert np.isclose(out[1], -2.0), out
    assert out[2] <= -1e29, "duplicate lane must drop to log-zero"
    assert out[3] <= -1e29, "dead lane stays dead"


def test_window_skip_equals_frame_at_a_time():
    # The blank-run skip window must be exact: W=8 and W=1 (the plain
    # frame-synchronous loop) must produce identical hypotheses/scores.
    for seed, merge in [(3, True), (11, False)]:
        params, pspec, jspec = _setup(seed=seed)
        B, T, H = 3, 17, 16
        audio = jax.random.normal(jax.random.PRNGKey(seed + 20), (B, T, H)) * 0.6
        t_lens = jnp.array([T, 13, 6])
        run = lambda w: jax.jit(lambda p, a, tl: beam_decode(
            p, a, tl, pspec, jspec, beam_width=4, max_tokens=20,
            merge_paths=merge, frames_per_step=w))(params, audio, t_lens)
        tok1, n1, s1 = run(1)
        tok8, n8, s8 = run(8)
        np.testing.assert_array_equal(np.asarray(n1), np.asarray(n8))
        for b in range(B):
            np.testing.assert_array_equal(
                np.asarray(tok1[b, : int(n1[b])]),
                np.asarray(tok8[b, : int(n8[b])]))
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s8),
                                   rtol=1e-5, atol=1e-5)


def test_merge_does_not_lose_mass_vs_no_merge():
    # Path-merging can only add probability mass to the surviving
    # hypothesis: the best merged score must be >= the best unmerged one.
    params, pspec, jspec = _setup(seed=9)
    B, T, H = 2, 14, 16
    audio = jax.random.normal(jax.random.PRNGKey(7), (B, T, H)) * 0.5
    t_lens = jnp.array([T, 11])
    _, _, s_merge = jax.jit(lambda p, a, tl: beam_decode(
        p, a, tl, pspec, jspec, beam_width=8, max_tokens=20,
        length_norm=False, merge_paths=True))(params, audio, t_lens)
    _, _, s_plain = jax.jit(lambda p, a, tl: beam_decode(
        p, a, tl, pspec, jspec, beam_width=8, max_tokens=20,
        length_norm=False, merge_paths=False))(params, audio, t_lens)
    assert (np.asarray(s_merge) >= np.asarray(s_plain) - 1e-5).all(), (
        s_merge, s_plain)
