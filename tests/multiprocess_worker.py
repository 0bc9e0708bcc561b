"""Worker for the two-process jax.distributed test (not a pytest module).

Usage: python tests/multiprocess_worker.py <rank> <port> <result_json>

Each process owns 4 virtual CPU devices; together they form one 8-device
"cluster" coordinated over localhost — the multi-host path
(jax.distributed.initialize + make_array_from_process_local_data) that the
reference exercises only on a real NCCL cluster (rnnt/train.py:25-36).
"""

import json
import os
import sys


def main() -> None:
    rank, port, result_path = int(sys.argv[1]), sys.argv[2], sys.argv[3]

    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=2, process_id=rank)

    import jax.numpy as jnp
    import numpy as np

    from rnnt_tpu.config.config import (
        Config, build_featurizer_spec, build_model_spec)
    from rnnt_tpu.models.rnnt import rnnt_init
    from rnnt_tpu.parallel.mesh import make_mesh, param_shardings
    from rnnt_tpu.train.loop import _shard_batch
    from rnnt_tpu.train.optim import make_optimizer
    from rnnt_tpu.train.step import TrainState, make_train_step

    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4, jax.local_device_count()
    is_main = jax.process_index() == 0

    cfg = Config()
    cfg.encoder.blocks = []
    cfg.encoder.epilogue_features = 32
    cfg.encoder.output_features = 64
    cfg.predictor.output_dim = 64
    cfg.predictor.symbol_embedding_dim = 32
    cfg.predictor.dropout = 0.0
    cfg.joint.hidden_features = 64
    cfg.training.precision = "fp32"
    spec = build_model_spec(cfg)
    fspec = build_featurizer_spec(cfg)

    mesh = make_mesh(data=8, model=1)
    tx, _ = make_optimizer(cfg.training, total_steps=100)
    params, model_state = rnnt_init(jax.random.PRNGKey(0), spec)
    params = jax.device_put(params, param_shardings(mesh, params))
    model_state = jax.device_put(model_state,
                                 param_shardings(mesh, model_state))
    opt_state = jax.jit(tx.init)(params)
    state = TrainState(params, opt_state, model_state,
                       jnp.zeros((), jnp.int32))

    # Deterministic GLOBAL batch; this process feeds only its local half
    # (rows [rank*4, rank*4+4)) — per-host input sharding, the reference's
    # DistributedSampler (rnnt/train.py:89).
    rng = np.random.RandomState(0)
    frames = fspec.num_frames(int(0.5 * fspec.sample_rate))
    samples = fspec.win_length + (frames - 1) * fspec.hop_length
    global_batch = {
        "audio": rng.randn(8, samples).astype(np.float32) * 0.1,
        "audio_lens": np.full((8,), samples, np.int32),
        "targets": rng.randint(0, 1023, size=(8, 8)).astype(np.int32),
        "target_lens": np.full((8,), 4, np.int32),
    }
    local = {k: v[rank * 4:(rank + 1) * 4] for k, v in global_batch.items()}
    batch = _shard_batch(local, mesh)
    for k, v in batch.items():
        assert v.shape[0] == 8, (k, v.shape)  # global shape assembled

    step = jax.jit(make_train_step(spec, fspec, tx, cfg.training.precision))
    state, metrics = step(state, batch, jax.random.PRNGKey(7))
    loss = float(metrics["loss"])

    # Process-0-only side effect (the reference's rank-0 writer pattern,
    # rnnt/util.py:46-60): only the main process writes the result.
    if is_main:
        with open(result_path, "w") as f:
            json.dump({"loss": loss, "process_count": jax.process_count(),
                       "device_count": jax.device_count()}, f)
    else:
        # A non-main write would race/corrupt; prove the guard is honored.
        assert not is_main
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
