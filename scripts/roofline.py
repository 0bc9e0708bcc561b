"""Whole-step roofline: per-segment timing of the base train step at B=32
plus analytic FLOP utilization for the encoder (the step's dominant
segment now that the loss kernels run near peak).

Segments: featurize (fwd only — audio carries no gradient), encoder
fwd+bwd, predictor fwd+bwd, joint+loss fwd+bwd (fused exact AND pruned),
optimizer update, and the full fused step for cross-checking.  Encoder
FLOPs are counted from the conv dims (2*B*T_out*K*Cin*Cout fwd per conv,
x3 for fwd+dgrad+wgrad); v5e bf16 peak 197 TFLOP/s.

Usage: python scripts/roofline.py [--platform cpu] [--batch 32]
Prints a markdown table for BASELINE.md + one JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

PEAK_BF16 = 197e12


def encoder_flops(spec, B: int, T_in: int) -> tuple[int, int]:
    """(fwd_flops, out_len) for one encoder forward at (B, T_in, bins)."""
    from rnnt_tpu.ops.causal_conv import causal_conv_out_len

    flops = 0
    t = T_in
    for cs in spec.encoder.conv_specs():
        t_out = causal_conv_out_len(t, cs)
        flops += 2 * B * t_out * cs.kernel_size * cs.in_channels * cs.out_channels
        t = t_out
    # Block residual 1x1 convs (full block-input length).
    t_b = causal_conv_out_len(T_in, spec.encoder.prologue_spec)
    for b in spec.encoder.blocks:
        flops += 2 * B * t_b * b.in_channels * b.out_channels
    # Output 1x1.
    flops += 2 * B * t * spec.encoder.epilogue_features * \
        spec.encoder.output_features
    return flops, t


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--seconds", type=float, default=5.0)
    args = ap.parse_args(argv)
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship, _synthetic_batch
    from rnnt_tpu.models.encoder import encoder_apply, encoder_out_len
    from rnnt_tpu.models.predictor import predictor_apply
    from rnnt_tpu.models.rnnt import rnnt_init
    from rnnt_tpu.ops.stft import make_featurizer
    from rnnt_tpu.ops.transducer_pallas import transducer_loss_pallas
    from rnnt_tpu.ops.transducer_pruned import pruned_transducer_loss
    from rnnt_tpu.train.optim import make_optimizer
    from rnnt_tpu.train.profiling import time_fn
    from rnnt_tpu.train.step import (
        TrainState, feature_lens_from_samples, make_train_step)

    cfg, spec, fspec = _flagship()
    B = args.batch
    batch = _synthetic_batch(fspec, batch=B, seconds=args.seconds,
                             max_tokens=64, vocab=cfg.num_total_symbols)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    params, model_state = rnnt_init(jax.random.PRNGKey(0), spec)
    featurize = make_featurizer(fspec)
    cdt = jnp.bfloat16 if cfg.training.precision == "bf16" else jnp.float32

    rows = []

    # 1) featurize (fwd only).
    feat_fn = jax.jit(lambda a: featurize(a).astype(cdt))
    t_feat = time_fn(feat_fn, batch["audio"], iters=20)
    feats = feat_fn(batch["audio"])
    rows.append(("featurize (fwd)", t_feat, None))

    # 2) encoder fwd+bwd.
    def enc_loss(p, f):
        out, _ = encoder_apply(p, model_state["encoder"], f, spec.encoder,
                               training=True, rng=jax.random.PRNGKey(3))
        return jnp.sum(out.astype(jnp.float32))

    enc_vg = jax.jit(jax.grad(enc_loss))
    t_enc = time_fn(enc_vg, params["encoder"], feats, iters=20)
    fwd_flops, t_out = encoder_flops(spec, B, feats.shape[1])
    enc_util = 3 * fwd_flops / t_enc / PEAK_BF16
    rows.append(("encoder (fwd+bwd)", t_enc,
                 f"{3*fwd_flops/t_enc/1e12:.1f} TF/s = "
                 f"{100*enc_util:.1f}% peak"))

    # Encoder fwd alone (for the fwd:bwd split).
    enc_fwd = jax.jit(lambda p, f: enc_loss(p, f))
    t_enc_fwd = time_fn(enc_fwd, params["encoder"], feats, iters=20)
    rows.append(("encoder (fwd only)", t_enc_fwd,
                 f"{fwd_flops/t_enc_fwd/1e12:.1f} TF/s = "
                 f"{100*fwd_flops/t_enc_fwd/PEAK_BF16:.1f}% peak"))

    # 3) predictor fwd+bwd.
    prepended = jnp.concatenate(
        [jnp.full((B, 1), spec.blank_idx, jnp.int32), batch["targets"]],
        axis=1)

    def pred_loss(p):
        out = predictor_apply(p, prepended, spec.predictor, training=True,
                              rng=jax.random.PRNGKey(4))
        return jnp.sum(out.astype(jnp.float32))

    pred_vg = jax.jit(jax.grad(pred_loss))
    t_pred = time_fn(pred_vg, params["predictor"], iters=20)
    rows.append(("predictor (fwd+bwd)", t_pred, None))

    # 4) joint+loss fwd+bwd on precomputed encoder/predictor outputs.
    enc_out, _ = jax.jit(lambda p, f: encoder_apply(
        p, model_state["encoder"], f, spec.encoder))(params["encoder"], feats)
    pred_out = jax.jit(lambda p: predictor_apply(
        p, prepended, spec.predictor))(params["predictor"])
    feat_lens = feature_lens_from_samples(batch["audio_lens"], fspec)
    t_lens = encoder_out_len(feat_lens, spec.encoder)

    loss_exact = jax.jit(jax.grad(lambda jp: transducer_loss_pallas(
        jp, enc_out, pred_out, batch["targets"], t_lens,
        batch["target_lens"], spec.blank_idx)))
    t_loss = time_fn(loss_exact, params["joint"], iters=10)
    rows.append(("joint+loss exact fused (fwd+bwd)", t_loss, None))

    import dataclasses
    spec_p = dataclasses.replace(spec, loss_impl="pruned")
    params_p, _ = rnnt_init(jax.random.PRNGKey(0), spec_p)
    loss_pruned = jax.jit(jax.grad(lambda jp: pruned_transducer_loss(
        jp, enc_out, pred_out, batch["targets"], t_lens,
        batch["target_lens"], spec.blank_idx, band=8)))
    t_lossp = time_fn(loss_pruned, params_p["joint"], iters=10)
    rows.append(("joint+loss pruned band-8 (fwd+bwd)", t_lossp, None))

    # 5) optimizer update.
    tx, _ = make_optimizer(cfg.training, total_steps=1000)
    opt_state = jax.jit(tx.init)(params)

    def opt_update(grads, opt_state, params):
        import optax
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt

    opt_fn = jax.jit(opt_update)
    t_opt = time_fn(opt_fn, params, opt_state, params, iters=20)
    rows.append(("optimizer (AdamW+clip)", t_opt, None))

    # 6) full fused step for cross-checking.
    for impl, pp in (("auto", params), ("pruned", params_p)):
        spec_i = dataclasses.replace(spec, loss_impl=impl)
        state = TrainState(pp, jax.jit(tx.init)(pp), model_state,
                           jnp.zeros((), jnp.int32))
        step = jax.jit(make_train_step(spec_i, fspec, tx,
                                       cfg.training.precision),
                       donate_argnums=(0,))
        state, m = step(state, batch, jax.random.PRNGKey(1))
        jax.block_until_ready(m["loss"])
        import time as _t
        n = 10
        t0 = _t.perf_counter()
        for _ in range(n):
            state, m = step(state, batch, jax.random.PRNGKey(1))
        jax.block_until_ready(m["loss"])
        rows.append((f"FULL STEP ({impl})", (_t.perf_counter() - t0) / n,
                     None))

    print(f"\nSegment table (B={B}, {args.seconds}s utterances, "
          f"T_feat={feats.shape[1]}, T_enc={int(t_out)}):\n")
    print("| segment | ms | notes |")
    print("|---|---|---|")
    for name, t, note in rows:
        print(f"| {name} | {t*1e3:.2f} | {note or ''} |")

    print()
    print(json.dumps({
        "metric": "encoder FLOP util (fwd+bwd, analytic conv FLOPs)",
        "value": round(100 * enc_util, 1),
        "unit": "% of v5e bf16 peak",
        "vs_baseline": None,
        "segments_ms": {name: round(t * 1e3, 2) for name, t, _ in rows},
    }))


if __name__ == "__main__":
    main()
