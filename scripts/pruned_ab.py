"""Exact-vs-pruned training A/B: does the pruned loss actually LEARN?

Runs the same overfit recipe the round-1 exact-path proof used (tiny_conv,
synthetic corpus, eval-on-train, deterministic seeds: rnnt_init PRNGKey(0),
shuffle seed = epoch, step rng PRNGKey(42) — identical across variants) once
per loss variant, and tabulates the WER trajectory plus each variant's own
loss curve from metrics.jsonl.  WER is the cross-objective comparable
signal: the pruned objective (0.5*simple + 1.0*banded) is not numerically
comparable to the exact NLL, but both runs decode with the same greedy
decoder on the same data.

Usage (ONE process at a time on the remote-TPU host):
    python scripts/pruned_ab.py                 # TPU, bands 8/16 + exact
    python scripts/pruned_ab.py --platform cpu --bands 8 --steps 120

Writes docs/pruned_ab.json and prints a markdown table for BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def run_variant(name: str, overrides: list[str], steps: int,
                output_base: str, config_name: str = "tiny_conv",
                size: int = 32, seconds: float = 0.0,
                max_words: int = 0, eval_steps: int = 100) -> dict:
    from rnnt_tpu.cli.train import resolve_config
    from rnnt_tpu.config.config import apply_overrides, load_config
    from rnnt_tpu.train.loop import train

    cfg = load_config(resolve_config(config_name))
    cfg.data.dataset = "synthetic"
    cfg.data.eval_on_train = True
    cfg.data.augment = False
    # The round-1 exact-path proof overfit 32 utterances in 400 steps
    # (WER 0.023); 128 utterances never break the blank barrier by step 400.
    cfg.data.synthetic_size = size
    if seconds:
        cfg.data.synthetic_seconds = seconds
    if max_words:
        cfg.data.synthetic_max_words = max_words
    cfg.training.num_epochs = 10 ** 6       # max_steps is the stop signal
    cfg.training.total_steps = steps
    cfg.training.log_steps = 25
    cfg.training.eval_steps = eval_steps
    cfg.training.checkpoint_steps = 10 ** 9  # no checkpoints mid-A/B
    cfg.training.eval_max_elements = min(size, 32)
    apply_overrides(cfg, overrides)
    cfg.model_name = f"pruned_ab_{name}"

    final_wer = train(cfg, output_base=output_base, max_steps=steps)

    run_dir = Path(output_base) / cfg.model_name
    latest = sorted((p for p in run_dir.glob("run-*")
                     if (p / "metrics.jsonl").exists()),
                    key=lambda p: int(p.name.split("-")[1]))[-1]
    curve, wers, exact = [], [], []
    with open(latest / "metrics.jsonl") as f:
        for line in f:
            rec = json.loads(line)
            if "loss/train" in rec:
                curve.append((rec["step"], rec["loss/train"]))
            if "wer/eval" in rec:
                wers.append((rec["step"], rec["wer/eval"]))
            if "loss/eval_exact" in rec:
                exact.append((rec["step"], rec["loss/eval_exact"]))
    return {"name": name, "final_wer": final_wer, "loss_curve": curve,
            "wer_curve": wers, "exact_nll_curve": exact,
            "run_dir": str(latest)}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--bands", nargs="*", default=["8", "16"],
                    help="band widths; '16w300' = band 16 with "
                         "pruned_warmup_steps=300 (k2-style exact warmup)")
    ap.add_argument("--skip-exact", action="store_true")
    ap.add_argument("--output-base", default="experiments")
    ap.add_argument("--config", default="tiny_conv",
                    help="base_convjs for the flagship-scale A/B")
    ap.add_argument("--size", type=int, default=32)
    ap.add_argument("--seconds", type=float, default=0.0)
    ap.add_argument("--max-words", type=int, default=0,
                    help="e.g. 60 for flagship-scale target U")
    ap.add_argument("--eval-steps", type=int, default=100)
    ap.add_argument("--tag", default="",
                    help="suffix for docs/pruned_ab{tag}.json")
    ap.add_argument("--seeds", type=int, default=1,
                    help="run each variant with training.seed=0..N-1 and "
                         "report mean±spread (VERDICT r4 #2: single-seed "
                         "synthetic A/Bs are barrier-breaking noise)")
    args = ap.parse_args(argv)

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    import re

    variants = []
    if not args.skip_exact:
        variants.append(("exact" + args.tag, ["training.loss_impl=auto"]))
    for band in args.bands:
        m = re.fullmatch(r"(\d+)(?:w(\d+))?", str(band))
        b, w = int(m.group(1)), int(m.group(2) or 0)
        name = f"pruned{b}" + (f"w{w}" if w else "") + args.tag
        ovr = ["training.loss_impl=pruned", f"training.pruned_band={b}",
               f"training.pruned_warmup_steps={w}"]
        variants.append((name, ovr))

    results = []
    for name, ovr in variants:
        for seed in range(args.seeds):
            sname = name if args.seeds == 1 else f"{name}-s{seed}"
            r = run_variant(sname, ovr + [f"training.seed={seed}"],
                            args.steps, args.output_base,
                            config_name=args.config, size=args.size,
                            seconds=args.seconds, max_words=args.max_words,
                            eval_steps=args.eval_steps)
            r["variant"] = name
            r["seed"] = seed
            results.append(r)
            # Incremental flush so a killed sweep keeps finished runs.
            _dump(args, results)

    print("\n| variant | " + " | ".join(
        f"WER@{s}" for s, _ in results[0]["wer_curve"])
        + " | exact NLL@end | final train loss |")
    print("|---|" + "---|" * (len(results[0]["wer_curve"]) + 2))
    for r in results:
        wer_cells = " | ".join(f"{w:.3f}" for _, w in r["wer_curve"])
        nll = (f"{r['exact_nll_curve'][-1][1]:.3f}"
               if r["exact_nll_curve"] else "-")
        print(f"| {r['name']} | {wer_cells} | {nll} | "
              f"{r['loss_curve'][-1][1]:.3f} |")

    if args.seeds > 1:
        import numpy as np

        print("\n| variant | final WER mean±std | exact NLL@end mean±std |")
        print("|---|---|---|")
        for name, _ in variants:
            rs = [r for r in results if r["variant"] == name]
            wers = np.array([r["final_wer"] for r in rs], float)
            nlls = np.array([r["exact_nll_curve"][-1][1] for r in rs
                             if r["exact_nll_curve"]], float)
            nll_cell = (f"{nlls.mean():.3f}±{nlls.std():.3f}"
                        if len(nlls) else "-")
            print(f"| {name} | {wers.mean():.3f}±{wers.std():.3f} "
                  f"(n={len(rs)}) | {nll_cell} |")


def _dump(args, results):
    out = Path("docs")
    out.mkdir(exist_ok=True)
    with open(out / f"pruned_ab{args.tag}.json", "w") as f:
        json.dump({"steps": args.steps, "config": args.config,
                   "size": args.size, "seconds": args.seconds,
                   "max_words": args.max_words, "seeds": args.seeds,
                   "results": results}, f, indent=1)


if __name__ == "__main__":
    main()
