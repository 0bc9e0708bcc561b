"""True augmented-step cost: the flagship train step jitted with
device_augment=False vs "full".  The donated state (params update every
step) already makes each dispatch unique — no extra perturbation needed
(a python-float add per iteration recompiles a constant-baked program
per step: measured 1104 ms/step of pure compile noise; don't do that)."""
import sys, time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship, _synthetic_batch
    from rnnt_tpu.models.rnnt import rnnt_init
    from rnnt_tpu.train.optim import make_optimizer
    from rnnt_tpu.train.step import TrainState, make_train_step

    cfg, spec, fspec = _flagship()
    tx, _ = make_optimizer(cfg.training, total_steps=1000)

    batch0 = _synthetic_batch(fspec, batch=32, seconds=5.0, max_tokens=64,
                              vocab=cfg.num_total_symbols)

    for mode in (False, "partial", "full"):
        params, model_state = rnnt_init(jax.random.PRNGKey(0), spec)
        opt_state = jax.jit(tx.init)(params)
        state = TrainState(params, opt_state, model_state,
                           jnp.zeros((), jnp.int32))
        da = {"partial": True}.get(mode, mode)
        step = jax.jit(make_train_step(spec, fspec, tx,
                                       cfg.training.precision,
                                       device_augment=da),
                       donate_argnums=(0,))
        rng = jax.random.PRNGKey(1)
        b = {k: jnp.asarray(v) for k, v in batch0.items()}
        t0 = time.perf_counter()
        for _ in range(2):
            state, metrics = step(state, b, rng)
        jax.block_until_ready(metrics["loss"])
        print(f"mode={mode}: compile+warm {time.perf_counter()-t0:.0f}s",
              flush=True)
        iters = 10
        t0 = time.perf_counter()
        for _ in range(iters):
            state, metrics = step(state, b, rng)
        jax.block_until_ready(metrics["loss"])
        dt = (time.perf_counter() - t0) / iters
        audio_s = float(np.sum(batch0["audio_lens"])) / 16000.0
        print(f"mode={mode}: {dt*1e3:.1f} ms/step = "
              f"{audio_s/dt:.0f} audio-s/s", flush=True)


if __name__ == "__main__":
    main()
