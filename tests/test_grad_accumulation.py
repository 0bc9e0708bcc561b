"""Gradient accumulation: two half-batch microsteps under
optax.MultiSteps(every_k=2) must produce the same parameter update as one
full-batch step (the reference left this capability commented out,
rnnt/config/basic_sp_convjs.yaml:81)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from rnnt_tpu.config.config import Config, BlockConfig, build_model_spec, \
    build_featurizer_spec
from rnnt_tpu.models.rnnt import rnnt_init
from rnnt_tpu.train.optim import make_optimizer
from rnnt_tpu.train.step import TrainState, make_train_step


def _cfg():
    cfg = Config()
    cfg.encoder.blocks = [BlockConfig(5, 24, 24, 0.0, 1)]
    cfg.encoder.epilogue_features = 24
    cfg.encoder.output_features = 24
    cfg.predictor.output_dim = 24
    cfg.predictor.symbol_embedding_dim = 16
    cfg.predictor.dropout = 0.0
    cfg.joint.hidden_features = 24
    cfg.training.precision = "fp32"
    cfg.training.loss_chunk_size = 8
    return cfg


def _batch(fspec, B, seed):
    rng = np.random.RandomState(seed)
    n = fspec.sample_rate // 2
    return {
        "audio": jnp.asarray(rng.randn(B, n).astype(np.float32) * 0.1),
        "audio_lens": jnp.full((B,), n, jnp.int32),
        "targets": jnp.asarray(rng.randint(1, 30, size=(B, 8)), jnp.int32),
        "target_lens": jnp.full((B,), 8, jnp.int32),
    }


def test_accumulated_update_matches_full_batch():
    cfg = _cfg()
    spec = build_model_spec(cfg)
    fspec = build_featurizer_spec(cfg)
    full = _batch(fspec, 4, seed=0)
    halves = [jax.tree.map(lambda x: x[:2], full),
              jax.tree.map(lambda x: x[2:], full)]
    rng = jax.random.PRNGKey(0)

    def run(accumulate, batches):
        tc = dataclasses.replace(cfg.training, accumulate_steps=accumulate)
        tx, _ = make_optimizer(tc, total_steps=10)
        params, model_state = rnnt_init(jax.random.PRNGKey(1), spec)
        state = TrainState(params, jax.jit(tx.init)(params), model_state,
                           jnp.zeros((), jnp.int32))
        step = jax.jit(make_train_step(spec, fspec, tx, "fp32"))
        for b in batches:
            state, _ = step(state, b, rng)
        return state.params

    p_full = run(1, [full])
    p_acc = run(2, halves)
    for a, b in zip(jax.tree.leaves(p_full), jax.tree.leaves(p_acc)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)
