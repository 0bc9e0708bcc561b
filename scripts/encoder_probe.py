"""Encoder-forward breakdown probe (VERDICT r3 #4): where do the
6.72 ms (50.8% of bf16 peak) go?  Variants isolate dropout RNG, erf-GELU,
and the norm passes.  Chained fori_loop timing (defeats dispatch overhead
and remote memoization; see CLAUDE.md measurement traps).

Usage: python scripts/encoder_probe.py [--platform cpu] [--batch 32]
"""
import argparse, sys, time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--seconds", type=float, default=5.0)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args(argv)
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _flagship
    from rnnt_tpu.models.encoder import encoder_apply, encoder_init
    from scripts.roofline import PEAK_BF16, encoder_flops

    cfg, spec, fspec = _flagship()
    B = args.batch
    T_in = fspec.num_frames(int(args.seconds * fspec.sample_rate))
    x0 = jax.random.normal(jax.random.PRNGKey(0),
                           (B, T_in, spec.encoder.input_features),
                           jnp.bfloat16)
    params, state = encoder_init(jax.random.PRNGKey(1), spec.encoder)
    fwd_flops, t_out = encoder_flops(spec, B, T_in)

    def timed(name, fn):
        # chain iters inside one dispatch; perturb input each iter AND vary
        # the outer input per rep (the remote runtime caches identical
        # dispatches).  params/state passed as ARGS — closing over 174 MB
        # of device arrays bakes them into the program as constants
        # (measured 195 ms/iter of pure overhead).
        @jax.jit
        def chained(p, s, x):
            def body(i, x):
                y, _ = fn(p, s, x)
                # fold a scalar of y back into x (defeats CSE), keep shapes
                return x + (y.mean() * 1e-6).astype(x.dtype)
            return jax.lax.fori_loop(0, args.iters, body, x)
        chained(params, state, x0).block_until_ready()
        reps = 3
        t0 = time.perf_counter()
        for j in range(1, reps + 1):
            chained(params, state,
                    x0 + j * jnp.bfloat16(1e-3)).block_until_ready()
        dt = (time.perf_counter() - t0) / (args.iters * reps)
        util = fwd_flops / dt / PEAK_BF16
        print(f"{name:42s} {dt*1e3:7.2f} ms   {util*100:5.1f}% of peak",
              flush=True)
        return dt

    rng = jax.random.PRNGKey(2)

    t_full = timed("fwd training=True (dropout+norm+gelu)",
                   lambda p, s, x: encoder_apply(p, s, x, spec.encoder,
                                                 training=True, rng=rng))
    t_nodrop = timed("fwd training=True rng=None (no dropout)",
                     lambda p, s, x: encoder_apply(p, s, x, spec.encoder,
                                                   training=True, rng=None))
    t_eval = timed("fwd training=False",
                   lambda p, s, x: encoder_apply(p, s, x, spec.encoder,
                                                 training=False))

    # GELU cost: monkeypatch approximate=True via a wrapper spec is
    # invasive; instead time gelu alone on a representative activation.
    act = jax.random.normal(jax.random.PRNGKey(3), (B, T_in // 2, 512),
                            jnp.bfloat16)

    def timed_el(name, fn):
        @jax.jit
        def chained(a):
            def body(i, a):
                return (fn(a) * jnp.bfloat16(1e-3) + a).astype(a.dtype)
            return jax.lax.fori_loop(0, args.iters, body, a)
        chained(act).block_until_ready()
        reps = 3
        t0 = time.perf_counter()
        for j in range(1, reps + 1):
            chained(act + j * jnp.bfloat16(1e-3)).block_until_ready()
        dt = (time.perf_counter() - t0) / (args.iters * reps)
        print(f"{name:42s} {dt*1e3:7.2f} ms", flush=True)
        return dt

    timed_el("gelu erf (B,250,512)", lambda a: jax.nn.gelu(a, approximate=False))
    timed_el("gelu tanh (B,250,512)", lambda a: jax.nn.gelu(a, approximate=True))
    k = jax.random.PRNGKey(4)
    timed_el("bernoulli threefry (B,250,512)",
             lambda a: jnp.where(jax.random.bernoulli(k, 0.9, a.shape),
                                 a / 0.9, 0.0).astype(a.dtype))
    timed_el("uint16-bits dropout (B,250,512)",
             lambda a: jnp.where(
                 jax.random.bits(k, a.shape, jnp.uint16) < 58982,
                 a / 0.9, 0.0).astype(a.dtype))

    # whole fwd with the uint16-bits dropout patched in
    import rnnt_tpu.models.encoder as enc_mod
    orig = enc_mod._dropout

    def cheap_dropout(x, rate, training, rng):
        if not training or rate == 0.0 or rng is None:
            return x
        thresh = int(round((1.0 - rate) * 65536.0))
        keep = thresh / 65536.0
        bits = jax.random.bits(rng, x.shape, jnp.uint16)
        return jnp.where(bits < thresh, x * (1.0 / keep), 0.0).astype(x.dtype)

    enc_mod._dropout = cheap_dropout
    try:
        timed("fwd training=True CHEAP dropout",
              lambda p, s, x: encoder_apply(p, s, x, spec.encoder,
                                            training=True, rng=rng))
    finally:
        enc_mod._dropout = orig

    print(f"\ndropout cost: {1e3*(t_full-t_nodrop):.2f} ms; "
          f"train-vs-eval: {1e3*(t_full-t_eval):.2f} ms; "
          f"conv-only ideal at 64% (bwd's util): "
          f"{fwd_flops/ (0.64*PEAK_BF16) * 1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
