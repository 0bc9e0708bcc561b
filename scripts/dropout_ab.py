"""Does uint16-bits dropout beat threefry-bernoulli dropout in the REAL
flagship train step?  (Isolated microbenches lie on this rig; the
donated-state step loop is the trustworthy harness.)"""
import sys, time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import rnnt_tpu.models.encoder as enc_mod
    from __graft_entry__ import _flagship, _synthetic_batch
    from rnnt_tpu.models.rnnt import rnnt_init
    from rnnt_tpu.train.optim import make_optimizer
    from rnnt_tpu.train.step import TrainState, make_train_step

    cfg, spec, fspec = _flagship()
    tx, _ = make_optimizer(cfg.training, total_steps=1000)
    batch0 = _synthetic_batch(fspec, batch=32, seconds=5.0, max_tokens=64,
                              vocab=cfg.num_total_symbols)
    audio_s = float(np.sum(batch0["audio_lens"])) / 16000.0

    def cheap_dropout(x, rate, training, rng):
        if not training or rate == 0.0 or rng is None:
            return x
        thresh = int(round((1.0 - rate) * 65536.0))
        keep = thresh / 65536.0
        bits = jax.random.bits(rng, x.shape, jnp.uint16)
        return jnp.where(bits < thresh, x * (1.0 / keep), 0.0).astype(x.dtype)

    orig = enc_mod._dropout
    for name, patch in (("threefry-bernoulli", orig),
                        ("uint16-bits", cheap_dropout)):
        enc_mod._dropout = patch
        params, model_state = rnnt_init(jax.random.PRNGKey(0), spec)
        opt_state = jax.jit(tx.init)(params)
        state = TrainState(params, opt_state, model_state,
                           jnp.zeros((), jnp.int32))
        step = jax.jit(make_train_step(spec, fspec, tx,
                                       cfg.training.precision),
                       donate_argnums=(0,))
        b = {k: jnp.asarray(v) for k, v in batch0.items()}
        rng = jax.random.PRNGKey(1)
        for _ in range(2):
            state, m = step(state, b, rng)
        jax.block_until_ready(m["loss"])
        iters = 15
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = step(state, b, rng)
        jax.block_until_ready(m["loss"])
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:22s} {dt*1e3:6.1f} ms/step  "
              f"{audio_s/dt:6.0f} audio-s/s", flush=True)
    enc_mod._dropout = orig


if __name__ == "__main__":
    main()
