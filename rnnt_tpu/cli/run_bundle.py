"""Transcribe wav files using ONLY an export bundle:
``python -m rnnt_tpu.cli.run_bundle <bundle_dir> file.wav [...]``.

The bundle-consumer counterpart of ``cli/infer``: where infer restores a
checkpoint and runs the live model, this drives the serialized StableHLO
graphs + manifest the way the reference's browser runtime drives its
exported TFJS graphs (reference rnnt-js/index.js:120-230) — proving the
export artifact is complete and self-contained.  No imports of
rnnt_tpu.models / train / decode / ops (see runtime/bundle.py).
"""

from __future__ import annotations

import argparse
import wave

import numpy as np


def read_wav(path: str) -> np.ndarray:
    with wave.open(path, "rb") as w:
        assert w.getnchannels() == 1, f"{path}: need mono audio"
        assert w.getsampwidth() == 2, f"{path}: need 16-bit PCM"
        assert w.getframerate() == 16000, \
            f"{path}: need 16 kHz audio, got {w.getframerate()}"
        pcm = np.frombuffer(w.readframes(w.getnframes()), dtype=np.int16)
    return pcm.astype(np.float32) / 32768.0


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("bundle", help="directory written by cli/export")
    ap.add_argument("wavs", nargs="+", help="16 kHz mono wav files")
    ap.add_argument("--streaming-chunks", type=float, default=0.0,
                    metavar="SECONDS",
                    help="feed the wav in SECONDS-sized pieces and print "
                         "incremental emissions (0 = offline one-shot)")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args(argv)

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from rnnt_tpu.runtime.bundle import BundleRuntime

    rt = BundleRuntime(args.bundle)
    for path in args.wavs:
        wav = read_wav(path)
        if args.streaming_chunks > 0:
            stream = rt.open_stream()
            step = int(args.streaming_chunks
                       * rt.manifest["sample_rate"])
            for pos in range(0, len(wav), step):
                new = stream.feed(wav[pos:pos + step])
                if new:
                    print(f"  +{rt.detokenize(new)}")
            stream.flush()
            tokens, text = stream.tokens, stream.text()
        else:
            tokens, text = rt.transcribe(wav)
        print(f"{path}: {text}")
        print(f"  tokens: {tokens}")


if __name__ == "__main__":
    main()
