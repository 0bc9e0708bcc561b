"""Memoization-SAFE device-augmentation breakdown.  Every outer dispatch
gets a distinct (input, seed) pair — the axon remote runtime caches
identical dispatches, so probes 1-3's repeated chained(audio0) calls
returned cached results and measured ~0 ms (CLAUDE.md trap, relearned).
"""
import argparse, sys, time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--seconds", type=float, default=5.0)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args(argv)
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from rnnt_tpu.data import augment_device as dev
    from rnnt_tpu.ops.window_gather import gather_windows

    B = args.batch
    L = int(args.seconds * 16000)
    rng = np.random.default_rng(0)
    audio0 = jnp.asarray(rng.standard_normal((B, L)) * 0.1, jnp.float32)
    lens = jnp.asarray(rng.integers(int(0.6 * L), L, (B,)), jnp.int32)
    n = args.iters

    def timed(name, fn):
        @jax.jit
        def chained(a, seed):
            def body(i, a):
                out = fn(jax.random.fold_in(jax.random.PRNGKey(seed), i), a)
                return out.astype(a.dtype)
            return jax.lax.fori_loop(0, n, body, a)
        chained(audio0, 0).block_until_ready()
        t0 = time.perf_counter()
        for j in range(1, args.reps + 1):
            chained(audio0 + j * 1e-4, j).block_until_ready()
        dt = (time.perf_counter() - t0) / (args.reps * n)
        print(f"{name:40s} {dt*1e3:8.2f} ms", flush=True)
        return dt

    u = lambda k: jax.random.uniform(k, (B,))
    ct = dev._chorus_table()
    kt = dev._compressor_table()

    timed("chorus fixed", lambda k, a: dev.chorus(
        a, 16000, 0.5, 0.8, 30.0 + u(k), 0.4, 0.1, 2.0))
    timed("chorus table", lambda k, a: dev.chorus(
        a, 16000, **{kk: v[jax.random.randint(k, (B,), 0, 10)]
                     for kk, v in ct.items()}))
    timed("compressor fixed", lambda k, a: dev.compressor(
        a, 16000, -20.0 + u(k), 4.0, 5.0, 250.0))
    timed("compressor table", lambda k, a: dev.compressor(
        a, 16000, **{kk: v[jax.random.randint(k, (B,), 0, 5)]
                     for kk, v in kt.items()}))
    timed("shaped-noise section", lambda k, a: a + dev.shape_noise(
        jax.random.uniform(k, (B, 1 << 17)),
        jax.random.uniform(k, (B, 8)) + 0.1,
        jnp.full((B,), 0.01))[:, :L])
    del gather_windows
    timed("peak_level", lambda k, a: dev.peak_level(a, lens, 0.5 + 0 * u(k)))
    timed("trim", lambda k, a: dev.trim(
        a, lens, jax.random.randint(k, (B,), 0, 320))[0])
    timed("resample", lambda k, a: dev.resample_lerp(
        a, lens, 2.0 ** (jax.random.uniform(k, (B,), minval=-.25,
                                            maxval=.25)))[0])
    timed("time_stretch", lambda k, a: dev.time_stretch(
        a, lens, jax.random.uniform(k, (B,), minval=0.75, maxval=1.25))[0])
    timed("device_augment (partial)",
          lambda k, a: dev.device_augment(k, a, lens))
    timed("device_augment_full",
          lambda k, a: dev.device_augment_full(k, a, lens)[0])


if __name__ == "__main__":
    main()
