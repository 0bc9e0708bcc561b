"""Global feature statistics tool:
``python -m rnnt_tpu.cli.calc_global_features --config <yaml> [--out json]``.

Capability parity with the reference tool (reference
rnnt/calc_global_features.py:15-105): stream the training set through the
featurizer with normalization disabled, accumulate per-channel sum and
squared sum, and write means + inverse stddevs to ``global_features.json``
— consumed as per-channel ``mean``/``invstddev`` vectors via the
``featurizer.global_stats`` config key (reference
config/basic_sp_convjs_globalfeat.yaml:17-18).
"""

from __future__ import annotations

import argparse
import dataclasses
import json

import numpy as np


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default="base_convjs")
    ap.add_argument("--out", default="global_features.json")
    ap.add_argument("--max-utterances", type=int, default=2000)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args(argv)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from rnnt_tpu.cli.train import resolve_config
    from rnnt_tpu.config.config import build_featurizer_spec, load_config
    from rnnt_tpu.ops.stft import make_featurizer
    from rnnt_tpu.train.loop import _load_datasets

    cfg = load_config(resolve_config(args.config))
    # Disable normalization: raw feature statistics are what we measure
    # (reference rnnt/calc_global_features.py:29).
    fspec = dataclasses.replace(build_featurizer_spec(cfg),
                                mean=0.0, invstddev=1.0)
    featurize = jax.jit(make_featurizer(fspec))

    train_ds, _ = _load_datasets(cfg)
    n_bins = fspec.num_bins
    total = np.zeros(n_bins, np.float64)
    total_sq = np.zeros(n_bins, np.float64)
    count = 0

    n = min(len(train_ds), args.max_utterances)
    for i in range(n):
        row = train_ds[int(i)]
        audio = np.asarray(row["audio"]["array"], np.float32)
        if fspec.num_frames(len(audio)) == 0:
            continue
        feats = np.asarray(featurize(audio))  # (frames, bins)
        total += feats.sum(axis=0)
        total_sq += (feats ** 2).sum(axis=0)
        count += feats.shape[0]
        if (i + 1) % 200 == 0:
            print(f"{i + 1}/{n} utterances, {count} frames")

    mean = total / count
    var = total_sq / count - mean ** 2
    invstddev = 1.0 / np.sqrt(np.maximum(var, 1e-10))

    with open(args.out, "w") as f:
        json.dump({"means": mean.tolist(), "invstddev": invstddev.tolist()},
                  f)
    print(f"wrote {args.out}: {count} frames over {n} utterances")


if __name__ == "__main__":
    main()
