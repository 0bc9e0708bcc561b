"""Export-bundle consumer runtime: transcribe using ONLY the files written
by ``cli/export`` — manifest.json, tokenizer.json, the numbered streaming
state ports, and the serialized StableHLO graphs.

This is the framework's analog of the reference's browser runtime
(reference rnnt-js/index.js:120-230: mic -> featurizer.js -> streaming
encoder with named state tensors -> decoder.js incremental greedy ->
detokenized transcript), which is what PROVES the reference's export
pipeline — the exported graphs have a living consumer.  Here the consumer
is first-class: ``cli/run_bundle`` transcribes wav files from a bundle and
``cli/serve --bundle`` serves streaming sessions from one, with zero
imports of ``rnnt_tpu.models`` / ``train`` / ``decode`` / ``ops`` — if a
graph or manifest field were missing or wrong, these paths break, not just
a test.

Decode semantics mirror the live greedy decoder (decode/greedy.py, itself
matching reference rnnt/model.py:45-139): time-synchronous, at most
``max_symbols_per_step`` emissions per frame, blank advances time.  The
predictor graph is a fixed token window (manifest ``predictor_tokens``);
the conv predictor's finite receptive field (manifest
``predictor_window``) makes a sliding window exact — asserted at load.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

_REQUIRED = ("manifest.json", "tokenizer.json",
             "encoder_streaming_states.json")


class BundleRuntime:
    """Loads a bundle directory; makes streams and offline transcriptions.

    Uses only: json, numpy, jax.numpy arrays, and jax.export.deserialize —
    deliberately NO imports from the model/training side of the package.
    """

    def __init__(self, bundle_dir: str | Path):
        bundle_dir = Path(bundle_dir)
        for name in _REQUIRED:
            if not (bundle_dir / name).exists():
                raise FileNotFoundError(f"{bundle_dir} is not an export "
                                        f"bundle (missing {name})")
        from jax import export as jexport

        self.manifest = json.loads((bundle_dir / "manifest.json").read_text())
        self.pieces = {int(k): v for k, v in json.loads(
            (bundle_dir / "tokenizer.json").read_text()).items()}
        self.graphs = {
            name: jexport.deserialize(
                (bundle_dir / f"{name}.stablehlo").read_bytes())
            for name in self.manifest["graphs"]}
        smeta = json.loads(
            (bundle_dir / "encoder_streaming_states.json").read_text())
        self.state_shapes = smeta["shapes"]
        # Sliding the fixed predictor window is only exact when it covers
        # the conv predictor's receptive field.
        self.pred_tokens = int(self.manifest.get("predictor_tokens", 16))
        window = int(self.manifest.get("predictor_window", 0))
        if window > self.pred_tokens:
            raise ValueError(
                f"bundle predictor window {window} exceeds the exported "
                f"token ports ({self.pred_tokens}); re-export with "
                f"--pred-tokens >= {window}")

    def detokenize(self, tokens) -> str:
        text = "".join(self.pieces.get(int(t), "") for t in tokens)
        return text.replace("▁", " ").strip()

    def open_stream(self, max_symbols_per_step: int = 10,
                    max_tokens: int = 512) -> "BundleStream":
        return BundleStream(self, max_symbols_per_step, max_tokens)

    def transcribe(self, wav: np.ndarray, *, pad_tail: bool = True,
                   max_symbols_per_step: int = 10, max_tokens: int = 512):
        """Offline path: one stream fed end-to-end.  ``pad_tail`` zero-pads
        the final partial chunk so trailing audio is decoded."""
        stream = self.open_stream(max_symbols_per_step, max_tokens)
        stream.feed(wav)
        if pad_tail:
            stream.flush()
        return list(stream.tokens), stream.text()


class BundleStream:
    """One streaming session over a bundle: buffers samples, featurizes +
    encodes full chunks (carrying the numbered encoder states), and runs
    the incremental greedy loop per encoder frame."""

    def __init__(self, runtime: BundleRuntime, max_symbols_per_step: int,
                 max_tokens: int = 512):
        import jax.numpy as jnp

        self._jnp = jnp
        self.rt = runtime
        m = runtime.manifest
        self.chunk_samples = int(m["chunk_samples"])
        self.new_per_chunk = self.chunk_samples - int(m["overlap"])
        self.blank = int(m["blank_idx"])
        self.max_symbols = max_symbols_per_step
        # Total emission budget — the live decoder's token-buffer cap
        # (decode/greedy.py max_tokens); keeps a degenerate model from
        # looping forever on one stream.
        self.max_tokens = max_tokens
        self.states = [jnp.zeros(s, jnp.float32)
                       for s in runtime.state_shapes]
        self.buffer = np.zeros((0,), np.float32)
        self.tokens: list[int] = []
        self._feat = None  # cached predictor feature for the current hist

    # ------------------------------------------------------------ decode
    def _pred_feat(self):
        jnp = self._jnp
        hist = ([self.blank] + self.tokens)[-self.rt.pred_tokens:]
        padded = (hist + [self.blank] * self.rt.pred_tokens)[
            :self.rt.pred_tokens]
        feats = self.rt.graphs["predictor"].call(
            jnp.asarray(padded, jnp.int32)[None, :])
        return np.asarray(feats)[:, len(hist) - 1]

    def _decode_frames(self, enc: np.ndarray):
        """Greedy over (1, T, H) encoder frames, continuing this stream's
        token history (reference rnnt-js/decoder.js:3-55 semantics)."""
        jnp = self._jnp
        if self._feat is None:
            self._feat = self._pred_feat()
        for t in range(enc.shape[1]):
            for _ in range(self.max_symbols):
                if len(self.tokens) >= self.max_tokens:
                    return
                logits = self.rt.graphs["joint"].call(
                    jnp.asarray(enc[:, t]), jnp.asarray(self._feat))
                k = int(np.argmax(np.asarray(logits)[0]))
                if k == self.blank:
                    break
                self.tokens.append(k)
                self._feat = self._pred_feat()

    # -------------------------------------------------------------- feed
    def feed(self, samples: np.ndarray) -> list[int]:
        """Buffer samples; featurize+encode+decode every full chunk.
        Returns the tokens newly emitted by this call."""
        jnp = self._jnp
        mark = len(self.tokens)
        self.buffer = np.concatenate(
            [self.buffer, np.asarray(samples, np.float32)])
        while len(self.buffer) >= self.chunk_samples:
            chunk = self.buffer[:self.chunk_samples]
            self.buffer = self.buffer[self.new_per_chunk:]
            feats = self.rt.graphs["featurize"].call(
                jnp.asarray(chunk, jnp.float32)[None, :])
            out = self.rt.graphs["encoder_streaming"].call(
                feats, *self.states)
            self.states = list(out[1:])
            self._decode_frames(np.asarray(out[0]))
        return self.tokens[mark:]

    def flush(self) -> list[int]:
        """Zero-pad the buffered tail to a full chunk and decode it."""
        if len(self.buffer) <= self.rt.manifest["overlap"]:
            return []
        pad = self.chunk_samples - len(self.buffer)
        if pad > 0:
            return self.feed(np.zeros((pad,), np.float32))
        return []

    def text(self) -> str:
        return self.rt.detokenize(self.tokens)
