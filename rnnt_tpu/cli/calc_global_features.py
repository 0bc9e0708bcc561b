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
    ap.add_argument("--histograms", default=None, metavar="DIR",
                    help="also accumulate per-channel log-spaced value "
                         "histograms (reference "
                         "rnnt/calc_global_features.py:51-92) and write "
                         "log_channel_<c>_histogram.png + histograms.json "
                         "into DIR")
    ap.add_argument("--histogram-bins", type=int, default=500)
    ap.add_argument("--histogram-pngs", type=int, default=1,
                    help="render PNGs for the first N channels (-1 = all; "
                         "histograms.json always has every channel).  The "
                         "reference renders channel 0 unless "
                         "render_histograms is flipped in source")
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

    # Per-channel value histograms over log-spaced bins (debugging aid for
    # picking featurizer normalization; reference
    # rnnt/calc_global_features.py:51-92 renders one channel by default,
    # all channels behind render_histograms — here one pass does all
    # channels at once since np.histogram over a feats column is cheap).
    hist = None
    if args.histograms:
        edges = np.logspace(np.log10(1e-9), np.log10(1e4),
                            args.histogram_bins + 1)
        hist = np.zeros((n_bins, args.histogram_bins), np.int64)

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
        if hist is not None:
            # One digitize pass for the whole (frames, bins) block.
            idx = np.clip(np.digitize(feats, edges) - 1, 0,
                          args.histogram_bins - 1)
            for c in range(n_bins):
                hist[c] += np.bincount(idx[:, c],
                                       minlength=args.histogram_bins)
        if (i + 1) % 200 == 0:
            print(f"{i + 1}/{n} utterances, {count} frames")

    mean = total / count
    var = total_sq / count - mean ** 2
    invstddev = 1.0 / np.sqrt(np.maximum(var, 1e-10))

    with open(args.out, "w") as f:
        json.dump({"means": mean.tolist(), "invstddev": invstddev.tolist()},
                  f)
    print(f"wrote {args.out}: {count} frames over {n} utterances")

    if hist is not None:
        _write_histograms(args.histograms, hist, edges,
                          n_pngs=args.histogram_pngs)


def _write_histograms(out_dir: str, hist: "np.ndarray",
                      edges: "np.ndarray", n_pngs: int = -1) -> None:
    """histograms.json (counts + edges, machine-readable) plus one PNG per
    channel in the reference's log_channel_<c>_histogram.png naming."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "histograms.json"), "w") as f:
        json.dump({"log_bin_edges": edges.tolist(),
                   "counts": hist.tolist()}, f)
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        print(f"wrote {out_dir}/histograms.json (matplotlib unavailable — "
              f"skipping PNGs)")
        return
    centers = (edges[:-1] + edges[1:]) / 2
    widths = np.diff(edges)
    n = hist.shape[0] if n_pngs < 0 else min(n_pngs, hist.shape[0])
    for c in range(n):
        plt.figure(figsize=(10, 6))
        plt.bar(centers, hist[c], align="center", width=widths,
                edgecolor="black")
        plt.xscale("log")
        plt.title(f"Logarithmic Histogram of Channel {c} Values")
        plt.xlabel("Value (log scale)")
        plt.ylabel("Count")
        plt.savefig(os.path.join(out_dir,
                                 f"log_channel_{c}_histogram.png"))
        plt.close()
    print(f"wrote {out_dir}: histograms.json + {n} PNGs")


if __name__ == "__main__":
    main()
