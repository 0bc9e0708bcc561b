"""Export CLI: ``python -m rnnt_tpu.cli.export <checkpoint_dir> [--out dir]``.

Capability parity with the reference's export pipeline
(reference rnnt/export_onnx.py:17-100 + scripts/exportjs.sh): the reference
TorchScripts and ONNX-exports four graphs (encoder, streaming encoder with
flattened state ports, predictor, per-(t,u) joint) plus an id→piece
tokenizer JSON, then converts through onnx2tf/tensorflowjs — a fragile
3-environment chain.

The TPU-native export is one step: each of the same four functions is
serialized with ``jax.export`` (StableHLO) next to the tokenizer JSON and
config — a self-contained serving bundle any XLA runtime (TPU serving, CPU,
IREE-style consumers) can load without Python.  The streaming encoder's
carry states are flattened to numbered ports, mirroring the reference's
named-port convention (rnnt/export_onnx.py:45-58).
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("checkpoint")
    ap.add_argument("--config", default=None)
    ap.add_argument("--out", default=None,
                    help="output dir (default: <checkpoint>/export)")
    ap.add_argument("--frames", type=int, default=8,
                    help="streaming chunk length in feature frames")
    ap.add_argument("--pred-tokens", type=int, default=16,
                    help="predictor graph token-window length (must cover "
                         "the conv predictor's receptive field for exact "
                         "sliding-window decode, runtime/bundle.py)")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args(argv)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from jax import export as jexport

    from rnnt_tpu.config.config import (
        build_featurizer_spec, build_model_spec, load_config)
    from rnnt_tpu.models.encoder import (
        encoder_apply, encoder_streaming_apply, encoder_streaming_init_state)
    from rnnt_tpu.models.joint import joint_single
    from rnnt_tpu.models.predictor import predictor_apply
    from rnnt_tpu.train import checkpoint as ckpt
    from rnnt_tpu.train.loop import _load_tokenizer

    cfg_path = args.config or ckpt.find_config(args.checkpoint)
    cfg = load_config(cfg_path)
    spec = build_model_spec(cfg)
    fspec = build_featurizer_spec(cfg)
    tokenizer = _load_tokenizer(cfg)

    restored = ckpt.restore_checkpoint(args.checkpoint)
    params, model_state = restored["params"], restored["model_state"]

    out_dir = Path(args.out or Path(args.checkpoint) / "export")
    out_dir.mkdir(parents=True, exist_ok=True)

    n_bins = fspec.num_bins
    H = spec.encoder.output_features

    def save(name, fn, *example_args):
        exported = jexport.export(jax.jit(fn))(*example_args)
        data = exported.serialize()
        (out_dir / f"{name}.stablehlo").write_bytes(data)
        print(f"  {name}.stablehlo ({len(data):,} bytes)")

    # 1. Batch encoder (dynamic-length analog: export at a nominal length;
    #    XLA serving re-exports per bucket; reference rnnt/export_onnx.py:39-43).
    feats = jnp.zeros((1, 64, n_bins), jnp.float32)
    save("encoder",
         lambda x: encoder_apply(params["encoder"], model_state["encoder"],
                                 x, spec.encoder, training=False)[0],
         feats)

    # 2. Streaming encoder with carry states flattened to numbered ports
    #    (reference rnnt/export_onnx.py:45-58).
    states0 = encoder_streaming_init_state(1, spec.encoder)

    def streaming_fn(x, *states):
        y, new_states = encoder_streaming_apply(
            params["encoder"], model_state["encoder"], x, tuple(states),
            spec.encoder)
        return (y,) + tuple(new_states)

    chunk = jnp.zeros((1, args.frames, n_bins), jnp.float32)
    save("encoder_streaming", streaming_fn, chunk, *states0)
    state_meta = [list(s.shape) for s in states0]
    (out_dir / "encoder_streaming_states.json").write_text(
        json.dumps({"num_states": len(state_meta), "shapes": state_meta}))

    # 3. Predictor over a token window (reference rnnt/export_onnx.py:62-66).
    pred_tokens = max(args.pred_tokens,
                      getattr(spec.predictor, "receptive_field", 0))
    tokens = jnp.zeros((1, pred_tokens), jnp.int32)
    save("predictor",
         lambda t: predictor_apply(params["predictor"], t, spec.predictor),
         tokens)

    # 4. Per-(t, u) joint (reference rnnt/export_onnx.py:69-82).
    a = jnp.zeros((1, H), jnp.float32)
    txt = jnp.zeros((1, spec.predictor.output_dim), jnp.float32)
    save("joint", lambda x, y: joint_single(params["joint"], x, y), a, txt)

    # 5. Featurizer: waveform chunk -> (1, frames, bins).  The reference's
    #    runtime ships a JS featurizer (rnnt-js/featurizer.js); without this
    #    graph a bundle consumer cannot go wav -> tokens.  Chunk length =
    #    frames*hop + (win-hop) overlap — the FeatureStreamer contract
    #    (rnnt-js/featurizer.js:79-107): feed frames*hop new samples per
    #    call, carrying the last win-hop samples forward.
    from rnnt_tpu.ops.stft import make_featurizer

    chunk_samples = args.frames * fspec.hop_length + fspec.overlap
    wav_chunk = jnp.zeros((1, chunk_samples), jnp.float32)
    save("featurize", jax.jit(make_featurizer(fspec)), wav_chunk)

    # 6. Tokenizer id→piece table (reference rnnt/export_onnx.py:85-89).
    (out_dir / "tokenizer.json").write_text(
        json.dumps({str(k): v for k, v in tokenizer.piece_table().items()}))
    print(f"  tokenizer.json ({tokenizer.vocab_size()} pieces)")

    # 7. Bundle manifest: everything a consumer needs to drive the graphs.
    (out_dir / "manifest.json").write_text(json.dumps({
        "sample_rate": fspec.sample_rate,
        "chunk_samples": chunk_samples,
        "chunk_frames": args.frames,
        "hop_length": fspec.hop_length,
        "win_length": fspec.win_length,
        "overlap": fspec.overlap,
        "num_bins": n_bins,
        "blank_idx": spec.blank_idx,
        "num_classes": spec.joint.num_classes,
        "predictor_window": getattr(spec.predictor, "receptive_field", 0),
        "predictor_tokens": pred_tokens,
        "graphs": ["featurize", "encoder", "encoder_streaming",
                   "predictor", "joint"],
    }, indent=2))
    print(f"export complete: {out_dir}")


if __name__ == "__main__":
    main()
