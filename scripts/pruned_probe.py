"""Pruned-loss segment breakdown at the train shape.

Harness rules learned the hard way (CLAUDE.md): pass ALL arrays as jit
args (no captured device constants), make dispatches unique by EVOLVING
the differentiated operand with a tiny SGD update each iteration (no
python-float perturbations — those bake per-iteration constants and
recompile), block once at the end.
"""
import argparse, sys, time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--band", type=int, default=16)
    ap.add_argument("--iters", type=int, default=15)
    args = ap.parse_args(argv)
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    import jax
    import jax.numpy as jnp
    from rnnt_tpu.models.joint import JointSpec, joint_init, project_sides
    from rnnt_tpu.ops import transducer_pruned as tp
    from rnnt_tpu.ops.transducer import lattice_nll

    B, T, U, H, V = args.batch, 250, 64, 1024, 1024
    band, tile = args.band, 16
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    audio = jax.random.normal(ks[0], (B, T, H), jnp.bfloat16)
    text = jax.random.normal(ks[1], (B, U + 1, H), jnp.bfloat16)
    targets = jax.random.randint(ks[2], (B, U), 0, V - 1)
    t_lens = jnp.full((B,), T, jnp.int32)
    u_lens = jnp.full((B,), U, jnp.int32)
    jp = joint_init(ks[3], JointSpec(-1, -1, H, V), simple=True)

    def timed(name, loss_of, var0, statics):
        """loss_of(var, *statics) -> scalar; evolve var by -1e-9*grad."""
        @jax.jit
        def step(var, statics):
            val, g = jax.value_and_grad(loss_of)(var, *statics)
            var = jax.tree.map(
                lambda v, gg: v - (1e-9 * gg).astype(v.dtype), var, g)
            return var, val
        var = var0
        var, val = step(var, statics)
        jax.block_until_ready(val)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            var, val = step(var, statics)
        jax.block_until_ready(val)
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name:44s} {dt*1e3:8.2f} ms", flush=True)
        return dt

    # 1. simple log-probs fwd+bwd (wrt simple heads)
    def l_simple(p, audio, text):
        lpb, lpl = tp.simple_joint_log_probs(p, audio, text, targets,
                                             u_lens, V - 1)
        return (lpb.sum() + lpl.sum()) * 1e-6

    timed("simple_joint_log_probs fwd+bwd", l_simple, jp["simple"],
          (audio, text))

    # 2. simple DP + occupancy fwd+bwd (wrt the lattice)
    lpb_s, lpl_s = jax.jit(tp.simple_joint_log_probs)(
        jp["simple"], audio, text, targets, u_lens, V - 1)

    def l_dp(lpb, lpl):
        losses, gamma = tp.nll_with_occupancy(lpb, lpl, t_lens, u_lens)
        return losses.sum() * 1e-6

    timed("nll_with_occupancy fwd+bwd", l_dp, lpb_s, (lpl_s,))

    # 3. prune_bounds fwd (not differentiated; evolve gamma instead)
    gamma = jax.nn.softmax(lpl_s, axis=-1)
    n_t = -(-T // tile)
    gamma_p = jnp.pad(gamma, ((0, 0), (0, n_t * tile - T), (0, 0)))

    def l_bounds(g):
        gt = g.reshape(B, n_t, tile, U + 1).sum(axis=2)
        s = tp.prune_bounds(gt, -(-t_lens // tile), u_lens, band)
        return s.astype(jnp.float32).sum() * 1e-9

    timed("prune_bounds fwd", l_bounds, gamma_p, ())

    # 4. banded fused joint fwd+bwd (wrt projected sides)
    s_tile = jax.jit(l_bounds_aux := lambda g: tp.prune_bounds(
        g.reshape(B, n_t, tile, U + 1).sum(axis=2),
        -(-t_lens // tile), u_lens, band))(gamma_p)
    audio_p, text_p = jax.jit(project_sides)(jp, audio, text)
    audio_p = jnp.pad(audio_p, ((0, 0), (0, n_t * tile - T), (0, 0)))
    targets_pad = jnp.concatenate(
        [targets, jnp.zeros((B, 1), targets.dtype)], axis=1)

    def l_banded(ap, jp_, tpj, s_tile):
        lpb, lpl = tp._banded_fused_log_probs(
            jp_, ap, tpj, s_tile, targets_pad, V - 1, band, tile, -1.0)
        return (lpb.sum() + lpl.sum()) * 1e-6

    timed("banded fused joint fwd+bwd", l_banded, audio_p,
          (jp, text_p, s_tile))

    # 5. banded_to_full + lattice DP fwd+bwd (wrt banded log-probs)
    lpb_b, lpl_b = jax.jit(
        lambda jp_, ap, tpj, st: tp._banded_fused_log_probs(
            jp_, ap, tpj, st, targets_pad, V - 1, band, tile, -1.0))(
        jp, audio_p, text_p, s_tile)
    lpb_b, lpl_b = lpb_b[:, :T], lpl_b[:, :T]
    bounds = jnp.repeat(s_tile, tile, axis=1)[:, :T]

    def l_b2f(lpb, lpl, bounds):
        return lattice_nll(tp.banded_to_full(lpb, bounds, U + 1),
                           tp.banded_to_full(lpl, bounds, U + 1),
                           t_lens, u_lens).sum() * 1e-6

    timed("banded_to_full + lattice DP fwd+bwd", l_b2f, lpb_b,
          (lpl_b, bounds))

    # 6. whole pruned loss fwd+bwd (wrt all joint params)
    def l_all(p, audio, text):
        return tp.pruned_transducer_loss(
            p, audio, text, targets, t_lens, u_lens, V - 1, band=band)

    t_banded = timed("banded fused joint fwd+bwd [for util]", l_banded,
                     audio_p, (jp, text_p, s_tile))
    t_whole = timed("pruned_transducer_loss fwd+bwd (whole)", l_all, jp,
                    (audio, text))

    # FLOP utilization of the SHIPPED pruned path (VERDICT r4 weak #5),
    # comparable to the exact fused path's 77.3% (BASELINE.md r2).  Useful
    # matmul FLOPs only (multiply-add = 2 FLOPs), 3 passes each
    # (fwd + dgrad + wgrad; the XLA banded joint does not remat):
    #   banded joint logits: (B, T_pad, S, H) x (H, V)
    #   simple heads: am (B,T,H)x(H,V), lm (B,U1,H)x(H,V)
    #   factored z lattice: (B,T,V) x (B,V,U1)
    # Band-selection one-hot einsums and the DP are overhead by this
    # definition — the util number charges their time but not their FLOPs,
    # exactly how the exact path's 77.3% charged DP time against joint
    # FLOPs.
    T_pad = n_t * tile
    U1 = U + 1
    f_banded = 3 * 2 * B * T_pad * band * H * V
    f_simple = 3 * 2 * B * (T + U1) * H * V
    f_z = 3 * 2 * B * T * U1 * V
    peak = 197e12
    print(f"\nFLOP util (v5e bf16 peak {peak/1e12:.0f} TFLOP/s), "
          f"B={B} T={T} U1={U1} S={band} H={H} V={V}:")
    print(f"  banded fused joint: {f_banded/1e9:.1f} GFLOP / "
          f"{t_banded*1e3:.2f} ms = {f_banded/t_banded/1e12:.1f} TFLOP/s "
          f"= {100*f_banded/t_banded/peak:.1f}% of peak")
    f_all = f_banded + f_simple + f_z
    print(f"  whole pruned loss:  {f_all/1e9:.1f} GFLOP / "
          f"{t_whole*1e3:.2f} ms = {f_all/t_whole/1e12:.1f} TFLOP/s "
          f"= {100*f_all/t_whole/peak:.1f}% of peak")
    # Work-reduction context: the exact fused joint computes U1-wide
    # lattices; the band computes S of them.  Wall-clock speed is the
    # number that matters — util quantifies how well the remaining work
    # maps to the MXU.
    f_exact = 4 * 2 * B * T_pad * (-(-U1 // 8) * 8) * H * V
    print(f"  (exact-path useful FLOPs at this shape: {f_exact/1e9:.1f} "
          f"GFLOP -> band does {100*f_banded/f_exact:.1f}% of the work)")


if __name__ == "__main__":
    main()
