"""Infer CLI: ``python -m rnnt_tpu.cli.infer <checkpoint_dir> <wav>``.

Parity with ``python -m rnnt.infer`` (reference rnnt/infer.py:21-73):
single-wav offline greedy decode, asserting 16 kHz input (:50).  Adds
``--streaming`` to decode chunk-by-chunk through the streaming runtime —
the capability the reference left as a TODO (rnnt/infer.py:61).
"""

from __future__ import annotations

import argparse
import wave

import jax
import numpy as np

from rnnt_tpu.config.config import build_featurizer_spec, build_model_spec, load_config
from rnnt_tpu.decode.greedy import greedy_decode
from rnnt_tpu.train import checkpoint as ckpt
from rnnt_tpu.train.loop import _load_tokenizer
from rnnt_tpu.train.step import make_eval_forward


def read_wav(path: str) -> tuple[np.ndarray, int]:
    """Minimal mono 16-bit WAV reader (no soundfile dependency)."""
    with wave.open(path, "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        ch = w.getnchannels()
        raw = w.readframes(n)
        data = np.frombuffer(raw, dtype=np.int16).astype(np.float32) / 32768.0
        if ch > 1:
            data = data.reshape(-1, ch).mean(axis=1)
    return data, sr


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("checkpoint")
    ap.add_argument("wav")
    ap.add_argument("--config", default=None)
    ap.add_argument("--streaming", action="store_true",
                    help="decode chunk-by-chunk through the streaming runtime")
    ap.add_argument("--chunk-ms", type=int, default=200)
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu, tpu)")
    args = ap.parse_args(argv)

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    cfg_path = args.config or ckpt.find_config(args.checkpoint)
    cfg = load_config(cfg_path)
    spec = build_model_spec(cfg)
    fspec = build_featurizer_spec(cfg)
    tokenizer = _load_tokenizer(cfg)

    restored = ckpt.restore_checkpoint(args.checkpoint)
    params, model_state = restored["params"], restored["model_state"]

    audio, sr = read_wav(args.wav)
    assert sr == fspec.sample_rate, (
        f"expected {fspec.sample_rate} Hz input, got {sr}")

    if args.streaming:
        from rnnt_tpu.decode.streaming import StreamingSession

        session = StreamingSession(params, model_state, spec, fspec)
        chunk = int(sr * args.chunk_ms / 1000)
        for i in range(0, len(audio), chunk):
            session.feed(audio[i:i + chunk])
        text = tokenizer.decode(session.tokens())
    else:
        eval_forward = jax.jit(make_eval_forward(spec, fspec,
                                                 cfg.training.precision))
        batch = {"audio": audio[None, :],
                 "audio_lens": np.array([len(audio)], np.int32)}
        enc, t_lens = eval_forward(params, model_state, batch)
        tokens, counts = greedy_decode(
            {"predictor": params["predictor"], "joint": params["joint"]},
            enc, t_lens, spec.predictor, spec.joint, max_tokens=400)
        text = tokenizer.decode(np.asarray(tokens)[0, : int(counts[0])])

    print(text)


if __name__ == "__main__":
    main()
