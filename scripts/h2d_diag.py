"""Characterize the step+H2D interleaving penalty: bytes vs round-trips vs
overlap.  Async loop (no per-step block), 20 steps each:
  A) full batch h2d per step (4 arrays, 10.5 MB)
  B) audio as int16 (cast on device)  — half the bytes
  C) targets/lens only per step (audio device-resident)
  D) full batch, but h2d runs in a background thread one step ahead
"""
import sys, threading, time
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
    rng_np = np.random.default_rng(0)

    def fresh_state():
        params, model_state = rnnt_init(jax.random.PRNGKey(0), spec)
        opt_state = jax.jit(tx.init)(params)
        return TrainState(params, opt_state, model_state,
                          jnp.zeros((), jnp.int32))

    batch0 = _synthetic_batch(fspec, batch=32, seconds=5.0, max_tokens=64,
                              vocab=cfg.num_total_symbols)
    audio_s = float(np.sum(batch0["audio_lens"])) / 16000.0
    N = 20
    host_batches = []
    for i in range(N + 2):
        b = dict(batch0)
        b["audio"] = b["audio"] + rng_np.standard_normal(
            b["audio"].shape).astype(np.float32) * 0.01
        host_batches.append(b)
    host16 = [{**b, "audio": (b["audio"] * 32767).astype(np.int16)}
              for b in host_batches]

    step = jax.jit(make_train_step(spec, fspec, tx, cfg.training.precision,
                                   device_augment="full"),
                   donate_argnums=(0,))
    step16 = jax.jit(make_train_step(spec, fspec, tx, cfg.training.precision,
                                     device_augment="full"),
                     donate_argnums=(0,))
    rng = jax.random.PRNGKey(1)

    def run(name, mode):
        state = fresh_state()
        # warm
        if mode == "int16":
            b = {k: jnp.asarray(v) for k, v in host16[0].items()}
            b["audio"] = b["audio"].astype(jnp.float32) / 32767.0
            state, m = step16(state, b, rng)
        else:
            b = {k: jnp.asarray(v) for k, v in host_batches[0].items()}
            state, m = step(state, b, rng)
        jax.block_until_ready(m["loss"])

        t0 = time.perf_counter()
        if mode == "full":
            for i in range(N):
                b = {k: jnp.asarray(v) for k, v in host_batches[i + 1].items()}
                state, m = step(state, b, rng)
        elif mode == "int16":
            for i in range(N):
                b = {k: jnp.asarray(v) for k, v in host16[i + 1].items()}
                b["audio"] = b["audio"].astype(jnp.float32) / 32767.0
                state, m = step16(state, b, rng)
        elif mode == "resident":
            b = {k: jnp.asarray(v) for k, v in host_batches[1].items()}
            jax.block_until_ready(b)
            for i in range(N):
                small = {k: jnp.asarray(host_batches[i + 1][k])
                         for k in ("audio_lens", "targets", "target_lens")}
                state, m = step(state, {**b, **small}, rng)
        elif mode == "thread":
            q = []
            lock = threading.Lock()

            def producer():
                for i in range(N):
                    db = {k: jnp.asarray(v)
                          for k, v in host_batches[i + 1].items()}
                    with lock:
                        q.append(db)

            th = threading.Thread(target=producer)
            th.start()
            got = 0
            while got < N:
                with lock:
                    db = q.pop(0) if q else None
                if db is None:
                    time.sleep(0.001)
                    continue
                state, m = step(state, db, rng)
                got += 1
            th.join()
        jax.block_until_ready(m["loss"])
        dt = (time.perf_counter() - t0) / N
        print(f"{name:28s} {dt*1e3:7.1f} ms/step  "
              f"{audio_s/dt:6.0f} audio-s/s", flush=True)

    run("A full-batch h2d", "full")
    run("B int16 audio h2d", "int16")
    run("C audio device-resident", "resident")
    run("D h2d in bg thread", "thread")


if __name__ == "__main__":
    main()
