"""Pruned (banded) transducer loss — ops/transducer_pruned.py.

Verifies the k2-style pruned loss (a capability the reference lacks; its
loss is the full-lattice torchaudio rnnt_loss, /root/reference/rnnt/model.py:35-41):
the banded loss equals the exact loss when the band covers the lattice,
upper-bounds it when narrower, produces valid monotone bounds, and trains
(finite, flowing gradients through every param group incl. the simple
heads)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rnnt_tpu.models.joint import JointSpec, joint_init
from rnnt_tpu.ops.transducer import (
    NEG,
    transducer_alpha_loss,
    transducer_loss,
)
from rnnt_tpu.ops.transducer_pruned import (
    banded_alpha_loss,
    prune_bounds,
    pruned_transducer_loss,
    simple_joint_log_probs,
)

B, T, U, H, V = 3, 17, 9, 32, 21
BLANK = V - 1


@pytest.fixture(scope="module")
def setup():
    rng = np.random.RandomState(0)
    spec = JointSpec(audio_features=H, text_features=H,
                     hidden_features=24, num_classes=V)
    jp = joint_init(jax.random.PRNGKey(0), spec, simple=True)
    audio = jnp.asarray(rng.randn(B, T, H).astype("f"))
    text = jnp.asarray(rng.randn(B, U + 1, H).astype("f"))
    targets = jnp.asarray(rng.randint(0, V - 1, (B, U)), jnp.int32)
    t_lens = jnp.asarray([17, 12, 9])
    u_lens = jnp.asarray([9, 5, 3])
    return jp, audio, text, targets, t_lens, u_lens


def test_full_band_equals_exact_loss(setup):
    jp, audio, text, targets, t_lens, u_lens = setup
    exact = transducer_loss(jp, audio, text, targets, t_lens, u_lens,
                            BLANK, chunk_size=4, reduction="none")
    banded = pruned_transducer_loss(
        jp, audio, text, targets, t_lens, u_lens, BLANK, band=U + 1,
        simple_scale=0.0, pruned_scale=1.0, chunk_size=4, reduction="none")
    np.testing.assert_allclose(np.asarray(exact), np.asarray(banded),
                               rtol=1e-5, atol=1e-5)


def test_pruned_warmup_loss_composition(setup):
    """pruned_warmup_loss == exact full-lattice NLL + simple_scale x
    simple NLL (the k2-style warmup objective), and it carries gradient
    into BOTH the full joint and the simple heads."""
    from rnnt_tpu.ops.transducer import lattice_nll
    from rnnt_tpu.ops.transducer_pruned import pruned_warmup_loss

    jp, audio, text, targets, t_lens, u_lens = setup
    got = pruned_warmup_loss(jp, audio, text, targets, t_lens, u_lens,
                             BLANK, simple_scale=0.5, chunk_size=4,
                             reduction="none")
    exact = transducer_loss(jp, audio, text, targets, t_lens, u_lens,
                            BLANK, chunk_size=4, reduction="none")
    lpb, lpl = simple_joint_log_probs(jp["simple"], audio, text, targets,
                                      u_lens, BLANK)
    simple = lattice_nll(lpb, lpl, t_lens, u_lens)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(exact + 0.5 * simple),
                               rtol=1e-5, atol=1e-5)
    g = jax.grad(lambda p: pruned_warmup_loss(
        p, audio, text, targets, t_lens, u_lens, BLANK,
        simple_scale=0.5, chunk_size=4))(jp)
    for path in (("out", "w"), ("simple", "am", "w"), ("simple", "lm", "w")):
        leaf = g
        for k in path:
            leaf = leaf[k]
        assert float(jnp.abs(leaf).sum()) > 0.0, path


def test_narrow_band_upper_bounds_exact(setup):
    jp, audio, text, targets, t_lens, u_lens = setup
    exact = np.asarray(transducer_loss(
        jp, audio, text, targets, t_lens, u_lens, BLANK,
        chunk_size=4, reduction="none"))
    for band in (4, 6, 8):
        banded = np.asarray(pruned_transducer_loss(
            jp, audio, text, targets, t_lens, u_lens, BLANK, band=band,
            simple_scale=0.0, pruned_scale=1.0, chunk_size=4,
            reduction="none"))
        assert np.all(banded >= exact - 1e-4), (band, banded, exact)
        assert np.all(np.isfinite(banded))


def test_banded_alpha_matches_full_alpha_at_zero_bounds():
    rng = np.random.RandomState(1)
    lpb = jnp.asarray(rng.randn(B, T, U + 1).astype("f") - 1.0)
    lpl = jnp.asarray(rng.randn(B, T, U + 1).astype("f") - 1.0)
    t_lens = jnp.asarray([T, 12, 9])
    u_lens = jnp.asarray([U, 5, 3])
    bounds = jnp.zeros((B, T), jnp.int32)  # band == whole lattice
    full = transducer_alpha_loss(lpb, lpl, t_lens, u_lens)
    banded = banded_alpha_loss(lpb, lpl, bounds, t_lens, u_lens)
    np.testing.assert_allclose(np.asarray(full), np.asarray(banded),
                               rtol=1e-5, atol=1e-5)


def test_scatter_dp_equals_banded_scan(setup):
    """Production path (banded_to_full + full-lattice DP) must equal the
    reference banded recursion for real occupancy-driven bounds."""
    from rnnt_tpu.ops.transducer import lattice_nll
    from rnnt_tpu.ops.transducer_pruned import banded_to_full

    jp, audio, text, targets, t_lens, u_lens = setup
    lpb_s, lpl_s = simple_joint_log_probs(jp["simple"], audio, text,
                                          targets, u_lens, BLANK)

    def nll_sum(x):
        return jnp.sum(lattice_nll(lpb_s, x, t_lens, u_lens))

    gamma = -jax.grad(nll_sum)(lpl_s)
    rng = np.random.RandomState(2)
    for band in (4, 7):
        bounds = prune_bounds(gamma, t_lens, u_lens, band)
        lpb = jnp.asarray(rng.randn(B, T, band).astype("f") - 1.0)
        lpl = jnp.asarray(rng.randn(B, T, band).astype("f") - 1.0)
        scan_nll = banded_alpha_loss(lpb, lpl, bounds, t_lens, u_lens)
        scatter_nll = lattice_nll(banded_to_full(lpb, bounds, U + 1),
                                  banded_to_full(lpl, bounds, U + 1),
                                  t_lens, u_lens)
        np.testing.assert_allclose(np.asarray(scan_nll),
                                   np.asarray(scatter_nll),
                                   rtol=1e-5, atol=1e-5)


def test_prune_bounds_invariants(setup):
    jp, audio, text, targets, t_lens, u_lens = setup
    lpb, lpl = simple_joint_log_probs(jp["simple"], audio, text, targets,
                                      u_lens, BLANK)

    from rnnt_tpu.ops.transducer import lattice_nll

    def nll_sum(x):
        return jnp.sum(lattice_nll(lpb, x, t_lens, u_lens))

    gamma = -jax.grad(nll_sum)(lpl)
    for band in (4, 8):
        s = np.asarray(prune_bounds(gamma, t_lens, u_lens, band))
        assert s.shape == (B, T)
        assert np.all(s[:, 0] == 0), "band must start at u=0 at t=0"
        d = np.diff(s, axis=1)
        assert np.all(d >= 0), "bounds must be monotone"
        assert np.all(d <= band - 1), "jumps must stay < band"
        assert np.all(s >= 0) and np.all(s <= U + 1 - band)
        # Final cell (t_len-1, u_len) in-band.
        for b in range(B):
            sf = s[b, int(t_lens[b]) - 1]
            assert sf <= int(u_lens[b]) < sf + band


def test_prune_bounds_end_pin_beats_jump_cap():
    """Adversarial case (advisor round-2 repro): ALL occupancy mass at low
    u, so the raw/monotone bounds stay at 0 and the forward jump cap alone
    would pull the pinned final frame below its target — the final cell
    (t_len-1, u_len) would fall out of band and the sample's pruned
    gradient would vanish.  The reverse pull-up pass must preserve the end
    pin while keeping monotonicity and the jump cap."""
    Tt, U1 = 5, 16  # 5 bound tiles
    band = 4
    gamma = np.zeros((2, Tt, U1), np.float32)
    gamma[:, :, 0] = 1.0  # mass at u=0 everywhere (uninformative init)
    t_lens = jnp.asarray([5, 5])
    u_lens = jnp.asarray([9, 12])  # feasible: 9,12 <= 4*(4-1)=12
    s = np.asarray(prune_bounds(jnp.asarray(gamma), t_lens, u_lens, band))
    for b, ul in enumerate((9, 12)):
        pin = min(max(ul - band + 1, 0), U1 - band)
        assert s[b, -1] == pin, (b, s[b], pin)
        assert s[b, -1] <= ul < s[b, -1] + band  # final cell in-band
    assert np.all(s[:, 0] == 0)
    d = np.diff(s, axis=1)
    assert np.all(d >= 0) and np.all(d <= band - 1)
    # Infeasible sample (u_len > (t_len-1)*(band-1)): the pin still wins;
    # s[0] is allowed to rise above 0.
    u_bad = jnp.asarray([14, 14])
    s2 = np.asarray(prune_bounds(jnp.asarray(gamma), t_lens, u_bad, band))
    assert np.all(s2[:, -1] == 14 - band + 1)
    assert np.all(np.diff(s2, axis=1) >= 0)
    assert np.all(np.diff(s2, axis=1) <= band - 1)


def test_pruned_grad_reaches_adversarial_sample():
    """End-to-end version of the pin fix: a sample whose simple-joint
    occupancy is pathologically concentrated early must still get a
    nonzero pruned gradient (pre-fix its loss hit the 1e6 cap)."""
    rng = np.random.RandomState(7)
    T2 = 16  # one bound tile of 16 frames... use chunked impl, tile=16
    spec = JointSpec(audio_features=H, text_features=H,
                     hidden_features=24, num_classes=V)
    jp = joint_init(jax.random.PRNGKey(4), spec, simple=True)
    # Bias the simple lm head so blank dominates: occupancy stays at low u.
    jp["simple"]["lm"]["b"] = jp["simple"]["lm"]["b"].at[BLANK].set(8.0)
    audio = jnp.asarray(rng.randn(1, 48, H).astype("f") * 0.1)
    text = jnp.asarray(rng.randn(1, U + 1, H).astype("f") * 0.1)
    targets = jnp.asarray(rng.randint(0, V - 1, (1, U)), jnp.int32)
    t_lens = jnp.asarray([48])
    u_lens = jnp.asarray([9])

    def loss(a):
        return pruned_transducer_loss(
            jp, a, text, targets, t_lens, u_lens, BLANK, band=4,
            simple_scale=0.0, pruned_scale=1.0, chunk_size=16,
            reduction="none")[0]

    val, g = jax.value_and_grad(loss)(audio)
    assert float(val) < 1e5, "pruned loss must not hit the degenerate cap"
    assert float(jnp.abs(g).max()) > 0


def test_fused_bounds_tile_validation(monkeypatch):
    monkeypatch.setenv("RNNT_PRUNED_IMPL", "fused")
    rng = np.random.RandomState(8)
    spec = JointSpec(audio_features=H, text_features=H,
                     hidden_features=24, num_classes=V)
    jp = joint_init(jax.random.PRNGKey(5), spec, simple=True)
    audio = jnp.asarray(rng.randn(1, 16, H).astype("f"))
    text = jnp.asarray(rng.randn(1, U + 1, H).astype("f"))
    targets = jnp.asarray(rng.randint(0, V - 1, (1, U)), jnp.int32)
    with pytest.raises(ValueError, match="bounds_tile"):
        pruned_transducer_loss(
            jp, audio, text, targets, jnp.asarray([16]), jnp.asarray([3]),
            BLANK, band=8, bounds_tile=12)


def test_simple_log_probs_normalized(setup):
    """Blank/label log-probs must come from a proper per-cell softmax:
    check against an explicit (T, U, V) materialization."""
    jp, audio, text, targets, t_lens, u_lens = setup
    sp = jp["simple"]
    am = np.asarray(audio @ sp["am"]["w"] + sp["am"]["b"])
    lm = np.asarray(text @ sp["lm"]["w"] + sp["lm"]["b"])
    logits = am[:, :, None, :] + lm[:, None, :, :]          # (B,T,U+1,V)
    lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    lpb_ref = lp[..., BLANK]
    tgt = np.concatenate([np.asarray(targets), np.zeros((B, 1), np.int32)], 1)
    lpl_ref = np.take_along_axis(lp, tgt[:, None, :, None], axis=-1)[..., 0]
    u_mask = np.arange(U + 1)[None, :] < np.asarray(u_lens)[:, None]
    lpl_ref = np.where(u_mask[:, None, :], lpl_ref, NEG)

    lpb, lpl = simple_joint_log_probs(sp, audio, text, targets, u_lens, BLANK)
    np.testing.assert_allclose(np.asarray(lpb), lpb_ref, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(lpl), lpl_ref, rtol=2e-4, atol=2e-4)


def test_nll_with_occupancy_matches_autodiff():
    """The fused losses+occupancy op must reproduce lattice_nll's value,
    gradient (under an arbitrary per-sample cotangent), and -grad==gamma."""
    from rnnt_tpu.ops.transducer import lattice_nll
    from rnnt_tpu.ops.transducer_pruned import nll_with_occupancy

    rng = np.random.RandomState(3)
    lpb = jnp.asarray(rng.randn(B, T, U + 1).astype("f") - 1.0)
    lpl = jnp.asarray(rng.randn(B, T, U + 1).astype("f") - 1.0)
    t_lens = jnp.asarray([T, 12, 9])
    u_lens = jnp.asarray([U, 5, 3])
    w = jnp.asarray(rng.rand(B).astype("f") + 0.5)

    losses, gamma = nll_with_occupancy(lpb, lpl, t_lens, u_lens)
    ref = lattice_nll(lpb, lpl, t_lens, u_lens)
    np.testing.assert_allclose(np.asarray(losses), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)

    def via_op(a, b):
        ls, _ = nll_with_occupancy(a, b, t_lens, u_lens)
        return jnp.sum(w * ls)

    def via_ref(a, b):
        return jnp.sum(w * lattice_nll(a, b, t_lens, u_lens))

    g_op = jax.grad(via_op, (0, 1))(lpb, lpl)
    g_ref = jax.grad(via_ref, (0, 1))(lpb, lpl)
    for a, b in zip(g_op, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)

    gamma_ref = -jax.grad(lambda b: jnp.sum(
        lattice_nll(lpb, b, t_lens, u_lens)))(lpl)
    np.testing.assert_allclose(np.asarray(gamma), np.asarray(gamma_ref),
                               rtol=1e-5, atol=1e-6)


def test_gradients_flow_and_finite(setup):
    jp, audio, text, targets, t_lens, u_lens = setup

    def loss_fn(p, a, x):
        return pruned_transducer_loss(
            p, a, x, targets, t_lens, u_lens, BLANK, band=4,
            simple_scale=0.5, pruned_scale=1.0, chunk_size=4)

    g, ga, gx = jax.grad(loss_fn, argnums=(0, 1, 2))(jp, audio, text)
    for leaf in jax.tree_util.tree_leaves((g, ga, gx)):
        assert np.all(np.isfinite(np.asarray(leaf)))
    for group in ("out", "audio_proj", "text_proj", "simple"):
        n = float(jnp.sqrt(sum(jnp.sum(l * l) for l in
                               jax.tree_util.tree_leaves(g[group]))))
        assert n > 0, f"no gradient reached joint[{group}]"
    assert float(jnp.abs(ga).max()) > 0 and float(jnp.abs(gx).max()) > 0


def test_grad_clamp_bounds_logit_grads(setup):
    jp, audio, text, targets, t_lens, u_lens = setup

    def loss(a, clamp):
        return pruned_transducer_loss(
            jp, a, text, targets, t_lens, u_lens, BLANK, band=4,
            simple_scale=0.0, pruned_scale=1.0, chunk_size=4,
            grad_clamp=clamp)

    g_free = jax.grad(loss)(audio, -1.0)
    g_clamped = jax.grad(loss)(audio, 1e-4)
    assert float(jnp.abs(g_clamped).max()) < float(jnp.abs(g_free).max())


def test_fused_banded_path_matches_chunked(monkeypatch):
    """RNNT_PRUNED_IMPL=fused (banded joint through the Pallas fused
    kernel, interpret mode on CPU) must match the chunked XLA path —
    same tile-granular bounds, same cells, same loss and gradients."""
    rng = np.random.RandomState(5)
    T2 = 32  # two 16-frame bound tiles
    spec = JointSpec(audio_features=H, text_features=H,
                     hidden_features=24, num_classes=V)
    jp = joint_init(jax.random.PRNGKey(2), spec, simple=True)
    audio = jnp.asarray(rng.randn(B, T2, H).astype("f") * 0.3)
    text = jnp.asarray(rng.randn(B, U + 1, H).astype("f") * 0.3)
    targets = jnp.asarray(rng.randint(0, V - 1, (B, U)), jnp.int32)
    t_lens = jnp.asarray([32, 24, 17])
    u_lens = jnp.asarray([9, 5, 3])

    def loss(p, impl):
        monkeypatch.setenv("RNNT_PRUNED_IMPL", impl)
        return pruned_transducer_loss(
            p, audio, text, targets, t_lens, u_lens, BLANK, band=8,
            simple_scale=0.5, pruned_scale=1.0, chunk_size=16)

    l_chunked, g_chunked = jax.value_and_grad(loss)(jp, "chunked")
    l_fused, g_fused = jax.value_and_grad(loss)(jp, "fused")
    np.testing.assert_allclose(float(l_chunked), float(l_fused),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_chunked),
                    jax.tree_util.tree_leaves(g_fused)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_degenerate_target_rate_is_bounded(monkeypatch):
    """u_len > n_tiles*(band-1) (too many labels for the band's rate cap)
    must yield a large-but-capped pruned loss, not 1e30/NaN."""
    monkeypatch.setenv("RNNT_PRUNED_IMPL", "chunked")
    rng = np.random.RandomState(6)
    spec = JointSpec(audio_features=H, text_features=H,
                     hidden_features=24, num_classes=V)
    jp = joint_init(jax.random.PRNGKey(3), spec, simple=True)
    audio = jnp.asarray(rng.randn(2, 16, H).astype("f"))  # ONE bound tile
    text = jnp.asarray(rng.randn(2, U + 1, H).astype("f"))
    targets = jnp.asarray(rng.randint(0, V - 1, (2, U)), jnp.int32)
    t_lens = jnp.asarray([16, 16])
    u_lens = jnp.asarray([9, 2])  # 9 > 1*(4-1): degenerate; 2 fits
    losses = pruned_transducer_loss(
        jp, audio, text, targets, t_lens, u_lens, BLANK, band=4,
        simple_scale=0.0, pruned_scale=1.0, chunk_size=16,
        reduction="none")
    assert np.all(np.isfinite(np.asarray(losses)))
    assert float(losses[0]) <= 1e6 + 1.0
    assert float(losses[1]) < 1e4  # the feasible sample stays normal


def test_train_step_integration():
    """loss_impl='pruned' through make_loss_fn + value_and_grad on the tiny
    config: finite loss, finite grads, simple heads created by rnnt_init."""
    from rnnt_tpu.cli.train import resolve_config
    from rnnt_tpu.config.config import (
        build_featurizer_spec,
        build_model_spec,
        load_config,
    )
    from rnnt_tpu.models.rnnt import rnnt_init
    from rnnt_tpu.train.step import make_loss_fn

    cfg = load_config(resolve_config("tiny_conv"))
    cfg.training.loss_impl = "pruned"
    cfg.training.pruned_band = 8
    cfg.training.loss_chunk_size = 8
    spec = build_model_spec(cfg)
    fspec = build_featurizer_spec(cfg)
    params, model_state = rnnt_init(jax.random.PRNGKey(0), spec)
    assert "simple" in params["joint"]

    rng = np.random.RandomState(0)
    samples = fspec.win_length + 40 * fspec.hop_length
    batch = {
        "audio": jnp.asarray(rng.randn(2, samples).astype("f") * 0.1),
        "audio_lens": jnp.full((2,), samples, jnp.int32),
        "targets": jnp.asarray(
            rng.randint(0, cfg.num_total_symbols - 1, (2, 12)), jnp.int32),
        "target_lens": jnp.asarray([12, 7], jnp.int32),
    }
    loss_fn = make_loss_fn(spec, fspec, cfg.training.precision)

    def wrapped(p):
        loss, _ = loss_fn(p, model_state, batch, jax.random.PRNGKey(1), True)
        return loss

    loss, grads = jax.jit(jax.value_and_grad(wrapped))(params)
    assert np.isfinite(float(loss))
    assert all(np.all(np.isfinite(np.asarray(l)))
               for l in jax.tree_util.tree_leaves(grads))
