"""Phase-level breakdown of the e2e training loop: batch fetch, H2D,
dispatch, device completion — where do 312 ms/step go when the step alone
is 50 ms and the host feed is 4 ms/batch?"""
import sys, time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from rnnt_tpu.cli.train import resolve_config
    from rnnt_tpu.config.config import (
        build_featurizer_spec, build_model_spec, load_config)
    from rnnt_tpu.data.dataset import (
        BatchIterator, Buckets, synthetic_dataset)
    from rnnt_tpu.data.pipeline import PrefetchIterator
    from rnnt_tpu.data.tokenizer import UnigramTokenizer
    from rnnt_tpu.models.rnnt import rnnt_init
    from rnnt_tpu.train.optim import make_optimizer
    from rnnt_tpu.train.step import TrainState, make_train_step

    cfg = load_config(resolve_config("base_convjs"))
    spec = build_model_spec(cfg)
    fspec = build_featurizer_spec(cfg)
    ds = synthetic_dataset(size=512, seconds=5.0)
    tok = UnigramTokenizer.from_file("/root/reference/spm_unigram_1023.model")
    buckets = Buckets.from_frames([512], [64], fspec)

    tx, _ = make_optimizer(cfg.training, total_steps=10000)
    params, model_state = rnnt_init(jax.random.PRNGKey(0), spec)
    opt_state = jax.jit(tx.init)(params)
    state = TrainState(params, opt_state, model_state,
                       jnp.zeros((), jnp.int32))
    step = jax.jit(make_train_step(spec, fspec, tx, cfg.training.precision,
                                   device_augment="full"),
                   donate_argnums=(0,))
    rng = jax.random.PRNGKey(1)

    def batches():
        epoch = 0
        while True:
            it = BatchIterator(ds, tok, buckets, batch_size=32,
                               augmentor=None, shuffle=True, seed=epoch,
                               num_workers=2)
            yield from PrefetchIterator(it, depth=4)
            epoch += 1

    gen = batches()
    for _ in range(3):
        batch = next(gen)
        state, metrics = step(state, {k: jnp.asarray(v)
                                      for k, v in batch.items()}, rng)
    jax.block_until_ready(metrics["loss"])

    N = 40
    t_fetch = t_h2d = t_disp = t_block = 0.0
    t0 = time.perf_counter()
    for i in range(N):
        ta = time.perf_counter()
        batch = next(gen)
        tb = time.perf_counter()
        db = {k: jnp.asarray(v) for k, v in batch.items()}
        jax.block_until_ready(db)
        tc = time.perf_counter()
        state, metrics = step(state, db, rng)
        td = time.perf_counter()
        jax.block_until_ready(metrics["loss"])
        te = time.perf_counter()
        t_fetch += tb - ta; t_h2d += tc - tb
        t_disp += td - tc; t_block += te - td
    total = time.perf_counter() - t0
    print(f"serialized {N} steps: {total/N*1e3:.1f} ms/step "
          f"(fetch {t_fetch/N*1e3:.1f}, h2d {t_h2d/N*1e3:.1f}, "
          f"dispatch {t_disp/N*1e3:.1f}, device {t_block/N*1e3:.1f})",
          flush=True)

    # async mode (the real loop): no per-step block
    t0 = time.perf_counter()
    for i in range(N):
        batch = next(gen)
        db = {k: jnp.asarray(v) for k, v in batch.items()}
        state, metrics = step(state, db, rng)
    jax.block_until_ready(metrics["loss"])
    total = time.perf_counter() - t0
    print(f"async {N} steps: {total/N*1e3:.1f} ms/step", flush=True)


if __name__ == "__main__":
    main()
