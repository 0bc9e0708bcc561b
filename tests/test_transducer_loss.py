"""Transducer loss tests against an independent numpy DP oracle.

The reference delegates to torchaudio's C++/CUDA rnnt_loss
(rnnt/model.py:35-41); here the oracle is a direct O(T·U) dynamic program
in numpy, and gradients are checked by directional finite differences.
"""

import numpy as np
import jax
import jax.flatten_util
import jax.numpy as jnp
import optax
import pytest

from rnnt_tpu.models.joint import JointSpec, joint_apply, joint_init
from rnnt_tpu.ops.transducer import (
    transducer_loss,
    transducer_loss_from_logits,
)


def np_rnnt_loss(logits, targets, t_len, u_len, blank):
    """Direct alpha DP for a single sample.  logits: (T, U+1, V)."""
    logits = np.asarray(logits, np.float64)
    lp = logits - np.log(np.exp(logits - logits.max(-1, keepdims=True)).sum(-1, keepdims=True)) - logits.max(-1, keepdims=True)
    T, U1, _ = lp.shape
    alpha = np.full((t_len, u_len + 1), -np.inf)
    alpha[0, 0] = 0.0
    for t in range(t_len):
        for u in range(u_len + 1):
            cands = []
            if t > 0:
                cands.append(alpha[t - 1, u] + lp[t - 1, u, blank])
            if u > 0:
                cands.append(alpha[t, u - 1] + lp[t, u - 1, targets[u - 1]])
            if cands and not (t == 0 and u == 0):
                m = max(cands)
                alpha[t, u] = m + np.log(sum(np.exp(c - m) for c in cands)) if m > -np.inf else -np.inf
    return -(alpha[t_len - 1, u_len] + lp[t_len - 1, u_len, blank])


def _random_case(seed, B=3, T=11, U=5, V=7):
    rng = np.random.RandomState(seed)
    logits = rng.randn(B, T, U + 1, V).astype(np.float32)
    targets = rng.randint(0, V - 1, size=(B, U)).astype(np.int32)
    t_lens = rng.randint(U + 1, T + 1, size=(B,)).astype(np.int32)
    u_lens = rng.randint(1, U + 1, size=(B,)).astype(np.int32)
    return logits, targets, t_lens, u_lens


def test_loss_matches_numpy_dp():
    logits, targets, t_lens, u_lens = _random_case(0)
    blank = logits.shape[-1] - 1
    ours = np.asarray(transducer_loss_from_logits(
        jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(t_lens),
        jnp.asarray(u_lens), blank, reduction="none"))
    for b in range(logits.shape[0]):
        ref = np_rnnt_loss(logits[b], targets[b], int(t_lens[b]),
                           int(u_lens[b]), blank)
        np.testing.assert_allclose(ours[b], ref, rtol=1e-4, atol=1e-4)


def test_padding_invariance():
    """Extra padded frames/labels beyond the valid lengths must not change
    the loss (replaces the reference's dynamic batch shapes with static
    padded shapes)."""
    logits, targets, t_lens, u_lens = _random_case(1)
    blank = logits.shape[-1] - 1
    base = np.asarray(transducer_loss_from_logits(
        jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(t_lens),
        jnp.asarray(u_lens), blank, reduction="none"))

    # Scribble on the padding.
    logits2 = logits.copy()
    for b in range(logits.shape[0]):
        logits2[b, t_lens[b]:] = 37.0
    pad_t = np.pad(logits2, ((0, 0), (0, 4), (0, 0), (0, 0)),
                   constant_values=5.0)
    out = np.asarray(transducer_loss_from_logits(
        jnp.asarray(pad_t), jnp.asarray(targets), jnp.asarray(t_lens),
        jnp.asarray(u_lens), blank, reduction="none"))
    np.testing.assert_allclose(out, base, rtol=1e-5, atol=1e-5)


def np_rnnt_grad(logits, targets, t_len, u_len, blank):
    """Exact float64 alpha/beta occupancy gradient wrt logits for one
    sample — the textbook transducer backward."""
    logits = np.asarray(logits, np.float64)
    T, U1, V = logits.shape
    mx = logits.max(-1, keepdims=True)
    lp = logits - (mx + np.log(np.exp(logits - mx).sum(-1, keepdims=True)))
    p = np.exp(lp)
    lpb = lp[..., blank]
    lpl = np.zeros((T, U1))
    for u in range(u_len):
        lpl[:, u] = lp[:, u, targets[u]]

    def lse(a, b):
        m = max(a, b)
        return m + np.log(np.exp(a - m) + np.exp(b - m)) if m > -np.inf else -np.inf

    alpha = np.full((t_len, u_len + 1), -np.inf)
    alpha[0, 0] = 0.0
    for t in range(t_len):
        for u in range(u_len + 1):
            if t == 0 and u == 0:
                continue
            a = alpha[t - 1, u] + lpb[t - 1, u] if t > 0 else -np.inf
            b = alpha[t, u - 1] + lpl[t, u - 1] if u > 0 else -np.inf
            alpha[t, u] = lse(a, b)
    beta = np.full((t_len + 1, u_len + 2), -np.inf)
    beta[t_len - 1, u_len] = lpb[t_len - 1, u_len]
    for t in range(t_len - 1, -1, -1):
        for u in range(u_len, -1, -1):
            if t == t_len - 1 and u == u_len:
                continue
            a = lpb[t, u] + beta[t + 1, u] if t + 1 < t_len else -np.inf
            b = lpl[t, u] + beta[t, u + 1] if u + 1 <= u_len else -np.inf
            beta[t, u] = lse(a, b)
    ll = beta[0, 0]

    grad = np.zeros_like(logits)
    for t in range(t_len):
        for u in range(u_len + 1):
            gb = (alpha[t, u] + lpb[t, u]
                  + (beta[t + 1, u] if t + 1 < t_len else
                     (0.0 if u == u_len else -np.inf)) - ll)
            gb = np.exp(gb)
            if u < u_len:
                gl = np.exp(alpha[t, u] + lpl[t, u] + beta[t, u + 1] - ll)
            else:
                gl = 0.0
            tot = gb + gl
            grad[t, u] = tot * p[t, u]
            grad[t, u, blank] -= gb
            if u < u_len:
                grad[t, u, targets[u]] -= gl
    return grad


def test_gradient_matches_numpy_oracle():
    logits, targets, t_lens, u_lens = _random_case(2, B=2, T=6, U=3, V=5)
    blank = logits.shape[-1] - 1

    def f(lg):
        return transducer_loss_from_logits(
            lg, jnp.asarray(targets), jnp.asarray(t_lens),
            jnp.asarray(u_lens), blank, reduction="sum")

    g = np.asarray(jax.grad(f)(jnp.asarray(logits)))
    for b in range(logits.shape[0]):
        ref = np_rnnt_grad(logits[b], targets[b], int(t_lens[b]),
                           int(u_lens[b]), blank)
        np.testing.assert_allclose(g[b, :t_lens[b], :u_lens[b] + 1],
                                   ref[:t_lens[b], :u_lens[b] + 1],
                                   rtol=1e-3, atol=1e-5)


@pytest.mark.parametrize("chunk_size", [4, 8, 32])
def test_chunked_fused_loss_matches_naive(chunk_size):
    """Production chunked joint+loss == naive full-lattice joint+loss,
    values and gradients."""
    key = jax.random.PRNGKey(0)
    B, T, U, H, V = 2, 13, 5, 16, 9
    spec = JointSpec(audio_features=H, text_features=H, hidden_features=H,
                     num_classes=V)
    params = joint_init(key, spec)
    audio = jax.random.normal(jax.random.PRNGKey(1), (B, T, H))
    text = jax.random.normal(jax.random.PRNGKey(2), (B, U + 1, H))
    targets = jax.random.randint(jax.random.PRNGKey(3), (B, U), 0, V - 1)
    t_lens = jnp.array([T, T - 3])
    u_lens = jnp.array([U, U - 2])

    def naive(p, a, x):
        logits = joint_apply(p, a, x)
        return transducer_loss_from_logits(logits, targets, t_lens, u_lens,
                                           spec.blank_idx)

    def fused(p, a, x):
        return transducer_loss(p, a, x, targets, t_lens, u_lens,
                               spec.blank_idx, chunk_size=chunk_size)

    ln = naive(params, audio, text)
    lf = fused(params, audio, text)
    np.testing.assert_allclose(float(ln), float(lf), rtol=1e-5, atol=1e-5)

    gn = jax.grad(naive, argnums=(0, 1, 2))(params, audio, text)
    gf = jax.grad(fused, argnums=(0, 1, 2))(params, audio, text)
    flat_n, _ = jax.flatten_util.ravel_pytree(gn)
    flat_f, _ = jax.flatten_util.ravel_pytree(gf)
    np.testing.assert_allclose(np.asarray(flat_f), np.asarray(flat_n),
                               rtol=1e-4, atol=1e-5)


def test_grad_clamp_bounds_logit_grads():
    """grad_clamp > 0 bounds d(loss)/d(logits) (torchaudio rnnt_loss clamp
    semantics; the reference tunes rnnt_grad_clamp in optuna.py:13-17)."""
    from rnnt_tpu.ops.transducer import transducer_loss_from_logits

    rng = np.random.RandomState(0)
    B, T, U1, V = 2, 6, 4, 8
    logits = jnp.asarray(rng.randn(B, T, U1, V).astype(np.float32) * 3)
    targets = jnp.asarray(rng.randint(0, V - 1, (B, U1 - 1)), jnp.int32)
    t_lens = jnp.array([6, 5], jnp.int32)
    u_lens = jnp.array([3, 2], jnp.int32)

    clamp = 1e-3
    g_unclamped = jax.grad(lambda l: transducer_loss_from_logits(
        l, targets, t_lens, u_lens, blank=V - 1))(logits)
    g_clamped = jax.grad(lambda l: transducer_loss_from_logits(
        l, targets, t_lens, u_lens, blank=V - 1, grad_clamp=clamp))(logits)

    assert float(jnp.max(jnp.abs(g_unclamped))) > clamp  # clamp is active
    assert float(jnp.max(jnp.abs(g_clamped))) <= clamp + 1e-9
    np.testing.assert_allclose(
        np.asarray(g_clamped),
        np.clip(np.asarray(g_unclamped), -clamp, clamp), atol=1e-7)


def test_grad_clamp_chunked_matches_pallas():
    """With the clamp active, the chunked-XLA and fused-Pallas paths must
    still produce identical parameter gradients."""
    from rnnt_tpu.models.joint import JointSpec, joint_init
    from rnnt_tpu.ops.transducer import transducer_loss
    from rnnt_tpu.ops.transducer_pallas import transducer_loss_pallas

    rng = np.random.RandomState(1)
    B, T, U, H, V = 2, 12, 5, 16, 8
    spec = JointSpec(-1, -1, H, V)
    params = joint_init(jax.random.PRNGKey(0), spec)
    audio = jnp.asarray(rng.randn(B, T, H).astype(np.float32))
    text = jnp.asarray(rng.randn(B, U + 1, H).astype(np.float32))
    targets = jnp.asarray(rng.randint(0, V - 1, (B, U)), jnp.int32)
    t_lens = jnp.array([12, 9], jnp.int32)
    u_lens = jnp.array([5, 3], jnp.int32)
    clamp = 1e-3

    def loss_chunked(p, a):
        return transducer_loss(p, a, text, targets, t_lens, u_lens,
                               blank=V - 1, chunk_size=4, grad_clamp=clamp)

    def loss_pallas(p, a):
        return transducer_loss_pallas(p, a, text, targets, t_lens, u_lens,
                                      blank=V - 1, grad_clamp=clamp)

    (lc, gc), (lp, gp) = (jax.value_and_grad(f, argnums=(0, 1))(params, audio)
                          for f in (loss_chunked, loss_pallas))
    np.testing.assert_allclose(float(lc), float(lp), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(gc), jax.tree.leaves(gp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-4)


def test_grad_clamp_reaches_train_step_loss_fn():
    """Regression: make_loss_fn (the actual train-step path) must forward
    spec.grad_clamp — it originally only reached rnnt_loss_apply, so the
    training.rnnt_grad_clamp config knob silently did nothing in training."""
    from rnnt_tpu.config.config import (
        Config, build_featurizer_spec, build_model_spec)
    from rnnt_tpu.models.rnnt import rnnt_init
    from rnnt_tpu.train.step import make_loss_fn

    cfg = Config()
    cfg.encoder.blocks = []
    cfg.encoder.epilogue_features = 32
    cfg.encoder.output_features = 64
    cfg.predictor.output_dim = 64
    cfg.predictor.symbol_embedding_dim = 32
    cfg.predictor.dropout = 0.0
    cfg.joint.hidden_features = 64
    cfg.training.precision = "fp32"
    cfg.training.loss_impl = "chunked"
    fspec = build_featurizer_spec(cfg)

    rng = np.random.RandomState(1)
    B = 2
    batch = {
        "audio": jnp.asarray(rng.randn(B, 8000).astype(np.float32) * 0.1),
        "audio_lens": jnp.asarray([8000, 6000], jnp.int32),
        "targets": jnp.asarray(rng.randint(0, 100, (B, 6)), jnp.int32),
        "target_lens": jnp.asarray([6, 4], jnp.int32),
    }

    spec_off = build_model_spec(cfg)
    cfg.training.rnnt_grad_clamp = 1e-5  # tiny: must visibly shrink grads
    spec_on = build_model_spec(cfg)
    assert spec_on.grad_clamp == 1e-5

    params, model_state = rnnt_init(jax.random.PRNGKey(0), spec_off)

    def grad_norm(spec):
        fn = make_loss_fn(spec, fspec, "fp32")
        g = jax.grad(lambda p: fn(p, model_state, batch, None, True)[0])(
            params)
        return float(optax.global_norm(g))

    n_off, n_on = grad_norm(spec_off), grad_norm(spec_on)
    assert n_on < 0.5 * n_off, (n_on, n_off)
