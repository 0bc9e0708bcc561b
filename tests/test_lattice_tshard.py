"""Sequence-parallel (T-sharded) lattice vs the single-device oracle.

SURVEY.md §5: the CP analog for transducers is sharding the T axis of the
(B, T, U) lattice across devices with ICI exchange of the alpha/beta
wavefront boundary rows.  These tests run the chain on a real
(data, model) mesh (virtual CPU devices, kernels in interpret mode) and
assert loss AND gradient equality with the unsharded XLA-scan oracle.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rnnt_tpu.ops.lattice_tshard import transducer_alpha_loss_tsharded
from rnnt_tpu.ops.transducer import transducer_alpha_loss
from rnnt_tpu.parallel.mesh import make_mesh


def _problem(B, T, U1, seed=0):
    rng = np.random.RandomState(seed)
    lpb = jnp.asarray(np.log(rng.uniform(0.2, 0.8, (B, T, U1))
                             ).astype(np.float32))
    lpl = jnp.asarray(np.log(rng.uniform(0.1, 0.6, (B, T, U1))
                             ).astype(np.float32))
    t_lens = jnp.asarray(rng.randint(T // 2, T + 1, (B,)), jnp.int32)
    u_lens = jnp.asarray(rng.randint(1, U1, (B,)), jnp.int32)
    return lpb, lpl, t_lens, u_lens


@pytest.mark.parametrize("n_shards", [2, 4])
def test_tsharded_loss_matches_oracle(n_shards):
    mesh = make_mesh(data=8 // n_shards, model=n_shards)
    B, T, U1 = 2, 2 * 128 + 37, 9  # T deliberately not shard-aligned
    lpb, lpl, t_lens, u_lens = _problem(B, T, U1)

    want = transducer_alpha_loss(lpb, lpl, t_lens, u_lens)
    got = jax.jit(lambda a, b: transducer_alpha_loss_tsharded(
        a, b, t_lens, u_lens, mesh))(lpb, lpl)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_tsharded_grads_match_oracle():
    mesh = make_mesh(data=4, model=2)
    B, T, U1 = 2, 150, 7
    lpb, lpl, t_lens, u_lens = _problem(B, T, U1, seed=3)

    def loss_ref(a, b):
        return jnp.sum(transducer_alpha_loss(a, b, t_lens, u_lens))

    def loss_ts(a, b):
        return jnp.sum(transducer_alpha_loss_tsharded(
            a, b, t_lens, u_lens, mesh))

    want = jax.grad(loss_ref, argnums=(0, 1))(lpb, lpl)
    got = jax.jit(jax.grad(loss_ts, argnums=(0, 1)))(lpb, lpl)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-4, atol=1e-5)


def test_tsharded_composes_with_dp():
    """batch_axis shards B over "data" while T shards over "model" — each
    (data, model) sub-row runs an independent chain; grads still match."""
    mesh = make_mesh(data=2, model=4)
    B, T, U1 = 4, 300, 6
    lpb, lpl, t_lens, u_lens = _problem(B, T, U1, seed=7)

    def loss_ref(a, b):
        return jnp.sum(transducer_alpha_loss(a, b, t_lens, u_lens))

    def loss_ts(a, b):
        return jnp.sum(transducer_alpha_loss_tsharded(
            a, b, t_lens, u_lens, mesh, batch_axis="data"))

    want_l = transducer_alpha_loss(lpb, lpl, t_lens, u_lens)
    got_l = jax.jit(lambda a, b: transducer_alpha_loss_tsharded(
        a, b, t_lens, u_lens, mesh, batch_axis="data"))(lpb, lpl)
    np.testing.assert_allclose(np.asarray(got_l), np.asarray(want_l),
                               rtol=1e-5, atol=1e-5)

    want = jax.grad(loss_ref, argnums=(0, 1))(lpb, lpl)
    got = jax.jit(jax.grad(loss_ts, argnums=(0, 1)))(lpb, lpl)
    # Looser than the n=2/T=150 test: at T=300 the per-shard partial-sum
    # order perturbs the f32 loss by ~6e-5, which scales every grad of the
    # sample by exp(eps) ~ 1.0001 (verified uniform, not structural).
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-3, atol=2e-4)


def test_train_step_lattice_shard_t_matches_unsharded():
    """End-to-end wiring: training.lattice_shard_t routes the train-step
    loss through the T-sharded chain (make_loss_fn -> transducer_loss ->
    lattice_nll(mesh)); loss equals the unsharded step's on a dp x tp
    mesh."""
    from rnnt_tpu.config.config import Config, build_featurizer_spec, build_model_spec
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

    rng = np.random.RandomState(0)
    B = 4
    batch = {
        "audio": jnp.asarray(rng.randn(B, 16000).astype(np.float32) * 0.1),
        "audio_lens": jnp.asarray([16000, 12000, 9000, 15000], jnp.int32),
        "targets": jnp.asarray(rng.randint(0, 100, (B, 8)), jnp.int32),
        "target_lens": jnp.asarray([8, 5, 3, 7], jnp.int32),
    }

    spec_plain = build_model_spec(cfg)
    cfg.training.lattice_shard_t = True
    spec_shard = build_model_spec(cfg)
    assert spec_shard.lattice_shard_t

    params, model_state = rnnt_init(jax.random.PRNGKey(0), spec_plain)

    mesh = make_mesh(data=2, model=4)
    plain = make_loss_fn(spec_plain, fspec, "fp32", mesh=mesh)
    shard = make_loss_fn(spec_shard, fspec, "fp32", mesh=mesh)
    l_plain = jax.jit(lambda p: plain(p, model_state, batch, None, False)[0])(params)
    l_shard = jax.jit(lambda p: shard(p, model_state, batch, None, False)[0])(params)
    np.testing.assert_allclose(np.asarray(l_shard), np.asarray(l_plain),
                               rtol=1e-5, atol=1e-5)
