"""Hyperparameter search CLI:
``python -m rnnt_tpu.cli.sweep --config <yaml> --trials N``.

Capability parity with the reference's Optuna study (reference
rnnt/optuna.py:7-44): repeatedly train with sampled hyperparameters,
minimize the returned eval WER, record failures as +inf.  The reference
needs Optuna + Postgres; this is a dependency-free random/TPE-lite search
(random sampling with top-half refinement) persisting trials to a JSONL
file so interrupted sweeps resume.
"""

from __future__ import annotations

import argparse
import json
import math
import random
from pathlib import Path

# Search space mirroring the reference's tuned knobs (rnnt/optuna.py:13-17)
# plus learning rate, which matters far more in practice.
SPACE = {
    "training.clip_grad_norm": ("log", 0.5, 50.0),
    # The reference's optuna study tunes rnnt_grad_clamp alongside the clip
    # (rnnt/optuna.py:13-17; its trainer never forwards it — here it's live,
    # bounding d(loss)/d(logits) in the transducer backward).
    "training.rnnt_grad_clamp": ("log", 0.01, 10.0),
    "training.optimizer.lr": ("log", 5e-5, 2e-3),
    "predictor.dropout": ("uniform", 0.0, 0.5),
}


def _set_path(cfg, dotted: str, value):
    obj = cfg
    *parents, leaf = dotted.split(".")
    for p in parents:
        obj = getattr(obj, p)
    setattr(obj, leaf, type(getattr(obj, leaf))(value))


def _sample(rng: random.Random, prior: list[dict]) -> dict:
    """Random sample; with enough history, sample near a top-half trial
    half the time (a TPE-flavoured exploit step)."""
    good = sorted((t for t in prior if math.isfinite(t["wer"])),
                  key=lambda t: t["wer"])[: max(len(prior) // 2, 1)]
    params = {}
    for key, (kind, lo, hi) in SPACE.items():
        if good and rng.random() < 0.5:
            base = rng.choice(good)["params"][key]
            jitter = rng.uniform(0.8, 1.25) if kind == "log" else rng.uniform(-0.05, 0.05)
            val = base * jitter if kind == "log" else base + jitter
        elif kind == "log":
            val = math.exp(rng.uniform(math.log(lo), math.log(hi)))
        else:
            val = rng.uniform(lo, hi)
        params[key] = min(max(val, lo), hi)
    return params


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default="tiny_conv")
    ap.add_argument("--trials", type=int, default=10)
    ap.add_argument("--max-steps", type=int, default=None)
    ap.add_argument("--study", default="sweep_trials.jsonl")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args(argv)

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from rnnt_tpu.cli.train import resolve_config
    from rnnt_tpu.config.config import load_config
    from rnnt_tpu.train.loop import train

    study_path = Path(args.study)
    trials = []
    if study_path.exists():
        trials = [json.loads(l) for l in study_path.read_text().splitlines()
                  if l.strip()]
        print(f"resuming study with {len(trials)} prior trials")

    rng = random.Random(args.seed + len(trials))
    for i in range(len(trials), args.trials):
        params = _sample(rng, trials)
        cfg = load_config(resolve_config(args.config))
        for k, v in params.items():
            _set_path(cfg, k, v)
        cfg.model_name = f"{cfg.model_name}_sweep{i}"
        print(f"trial {i}: {params}")
        try:
            wer = float(train(cfg, max_steps=args.max_steps))
            if math.isnan(wer):
                wer = float("inf")
        except Exception as e:  # failed trial scores inf (rnnt/optuna.py:22-26)
            print(f"trial {i} failed: {e}")
            wer = float("inf")
        trial = {"trial": i, "params": params, "wer": wer}
        trials.append(trial)
        with open(study_path, "a") as f:
            f.write(json.dumps(trial) + "\n")
        print(f"trial {i}: wer={wer}")

    finite = [t for t in trials if math.isfinite(t["wer"])]
    if finite:
        best = min(finite, key=lambda t: t["wer"])
        print(f"best: trial {best['trial']} wer={best['wer']} {best['params']}")


if __name__ == "__main__":
    main()
