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

    def timed(name, fn, *fargs):
        # chain iters runs inside one dispatch; perturb input each iter.
        @jax.jit
        def chained(x):
            def body(i, x):
                y, _ = fn(x, *fargs)
                # fold a scalar of y back into x (defeats CSE), keep shapes
                return x + (y.mean() * 1e-6).astype(x.dtype)
            return jax.lax.fori_loop(0, args.iters, body, x)
        chained(x0).block_until_ready()
        t0 = time.perf_counter()
        chained(x0).block_until_ready()
        dt = (time.perf_counter() - t0) / args.iters
        util = fwd_flops / dt / PEAK_BF16
        print(f"{name:42s} {dt*1e3:7.2f} ms   {util*100:5.1f}% of peak",
              flush=True)
        return dt

    rng = jax.random.PRNGKey(2)

    t_full = timed("fwd training=True (dropout+norm+gelu)",
                   lambda x: encoder_apply(params, state, x, spec.encoder,
                                           training=True, rng=rng))
    t_nodrop = timed("fwd training=True rng=None (no dropout)",
                     lambda x: encoder_apply(params, state, x, spec.encoder,
                                             training=True, rng=None))
    t_eval = timed("fwd training=False",
                   lambda x: encoder_apply(params, state, x, spec.encoder,
                                           training=False))

    # GELU cost: monkeypatch approximate=True via a wrapper spec is
    # invasive; instead time gelu alone on a representative activation.
    act = jax.random.normal(jax.random.PRNGKey(3), (B, T_in // 2, 512),
                            jnp.bfloat16)

    def timed_el(name, fn):
        @jax.jit
        def chained(a):
            def body(i, a):
                return fn(a) + a * 1e-6
            return jax.lax.fori_loop(0, args.iters, body, a)
        chained(act).block_until_ready()
        t0 = time.perf_counter()
        chained(act).block_until_ready()
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name:42s} {dt*1e3:7.2f} ms", flush=True)
        return dt

    timed_el("gelu erf (B,250,512)", lambda a: jax.nn.gelu(a, approximate=False))
    timed_el("gelu tanh (B,250,512)", lambda a: jax.nn.gelu(a, approximate=True))
    k = jax.random.PRNGKey(4)
    timed_el("bernoulli threefry (B,250,512)",
             lambda a: jnp.where(jax.random.bernoulli(k, 0.9, a.shape),
                                 a / 0.9, 0.0).astype(a.dtype))

    print(f"\ndropout cost: {1e3*(t_full-t_nodrop):.2f} ms; "
          f"train-vs-eval: {1e3*(t_full-t_eval):.2f} ms; "
          f"conv-only ideal at 64% (bwd's util): "
          f"{fwd_flops/ (0.64*PEAK_BF16) * 1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
