"""Export-bundle completeness: the serialized bundle ALONE must transcribe.

Drives the real export CLI on a random-init checkpoint, then implements a
consumer that uses only the bundle artifacts (manifest.json, tokenizer.json,
*.stablehlo graphs deserialized via jax.export) to go
wav -> featurizer -> streaming encoder (numbered state ports) ->
predictor/joint greedy loop -> tokens/text, and asserts token-exact equality
with the live model pipeline.

Reference analog: rnnt-js/index.js:120-230 consumes the exported graphs the
same way (featurizer.js + decoder.js + 14 named state tensors); its
converter bugs were found by hand — here the roundtrip is automated.
"""

import json
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import export as jexport

from rnnt_tpu.cli import export as export_cli
from rnnt_tpu.config.config import build_featurizer_spec, build_model_spec, load_config
from rnnt_tpu.decode.greedy import greedy_decode
from rnnt_tpu.models.rnnt import rnnt_init
from rnnt_tpu.models.encoder import encoder_apply
from rnnt_tpu.ops.stft import make_featurizer
from rnnt_tpu.train import checkpoint as ckpt
from rnnt_tpu.train.step import TrainState

CFG_YAML = """
model_name: bundle_test
num_text_tokens: 63
num_total_symbols: 64
blank_idx: 63
tokenizer:
  spm_model: /root/reference/spm_unigram_1023.model
featurizer: {kind: spectrogram, mean: 15.0, invstddev: 0.25}
predictor: {kind: conv, output_dim: 48, symbol_embedding_dim: 32, dropout: 0.0}
encoder:
  input_features: 201
  norm_type: batch           # streaming-exact (frozen stats)
  prologue_kernel_size: 11
  prologue_stride: 2
  blocks:
    - {kernel_size: 11, in_channels: 24, out_channels: 24, dropout: 0.0, num_sub_blocks: 2}
  epilogue_features: 24
  epilogue_kernel_size: 9
  epilogue_dilation: 2
  output_features: 48
joint: {audio_features: -1, text_features: -1, hidden_features: 48}
"""


class BundleConsumer:
    """Transcribes using ONLY files in the export directory."""

    def __init__(self, bundle_dir: Path):
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

    def transcribe(self, wav: np.ndarray, max_tokens: int = 15,
                   max_symbols_per_step: int = 10):
        m = self.manifest
        chunk_samples = m["chunk_samples"]
        new_per_chunk = chunk_samples - m["overlap"]
        blank = m["blank_idx"]

        # Featurize + stream-encode chunk by chunk (FeatureStreamer
        # contract: consume chunk_frames*hop samples, carry the overlap).
        states = [jnp.zeros(s, jnp.float32) for s in self.state_shapes]
        enc_frames = []
        pos = 0
        while pos + chunk_samples <= len(wav):
            chunk = wav[pos:pos + chunk_samples]
            pos += new_per_chunk
            feats = self.graphs["featurize"].call(
                jnp.asarray(chunk, jnp.float32)[None, :])
            out = self.graphs["encoder_streaming"].call(feats, *states)
            enc_frames.append(np.asarray(out[0]))
            states = list(out[1:])
        audio = np.concatenate(enc_frames, axis=1)  # (1, T, H)

        # Greedy transducer loop (reference rnnt-js/decoder.js:3-55
        # semantics: conv predictor re-run on the padded token history).
        pred_len = 16  # the exported predictor's token-window length
        tokens: list[int] = []

        def pred_feat():
            hist = [blank] + tokens
            padded = (hist + [blank] * pred_len)[:pred_len]
            feats = self.graphs["predictor"].call(
                jnp.asarray(padded, jnp.int32)[None, :])
            return np.asarray(feats)[:, len(hist) - 1]

        feat = pred_feat()
        for t in range(audio.shape[1]):
            for _ in range(max_symbols_per_step):
                logits = self.graphs["joint"].call(
                    jnp.asarray(audio[:, t]), jnp.asarray(feat))
                k = int(np.argmax(np.asarray(logits)[0]))
                if k == blank or len(tokens) >= max_tokens:
                    break
                tokens.append(k)
                feat = pred_feat()
        text = "".join(self.pieces.get(t, "") for t in tokens)
        return tokens, text.replace("▁", " ").strip()


@pytest.fixture(scope="module")
def bundle(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("bundle")
    cfg_path = tmp / "config.yaml"
    cfg_path.write_text(CFG_YAML)
    cfg = load_config(cfg_path)
    spec = build_model_spec(cfg)

    params, model_state = rnnt_init(jax.random.PRNGKey(0), spec)
    # Bias the blank logit so a random-init model emits a plausible token
    # rate (a few per utterance) instead of max_symbols every frame.
    b = params["joint"]["out"]["b"]
    params["joint"]["out"]["b"] = b.at[spec.blank_idx].add(0.35)

    state = TrainState(params=params, model_state=model_state,
                       opt_state=None, step=jnp.ones((), jnp.int32))
    run_dir = tmp / "run-1"
    run_dir.mkdir()
    ckpt.save_checkpoint(run_dir, state, cfg, wait=True)
    ckpt_dir = ckpt.checkpoint_dir(run_dir, 1)

    out_dir = tmp / "export"
    export_cli.main([str(ckpt_dir), "--out", str(out_dir), "--frames", "8"])
    return out_dir, cfg, spec, params, model_state


def test_bundle_files_complete(bundle):
    out_dir = bundle[0]
    for name in ("featurize", "encoder", "encoder_streaming", "predictor",
                 "joint"):
        assert (out_dir / f"{name}.stablehlo").exists(), name
    for name in ("tokenizer.json", "manifest.json",
                 "encoder_streaming_states.json"):
        assert (out_dir / name).exists(), name
    manifest = json.loads((out_dir / "manifest.json").read_text())
    assert manifest["num_bins"] == 201 and manifest["blank_idx"] == 63


def test_bundle_alone_transcribes_token_exact(bundle):
    out_dir, cfg, spec, params, model_state = bundle
    fspec = build_featurizer_spec(cfg)

    consumer = BundleConsumer(out_dir)
    m = consumer.manifest
    n_chunks = 4
    wav_len = n_chunks * (m["chunk_samples"] - m["overlap"]) + m["overlap"]
    rng = np.random.RandomState(3)
    t = np.arange(wav_len) / m["sample_rate"]
    wav = (0.3 * np.sin(2 * np.pi * 700 * t)
           + 0.1 * rng.randn(wav_len)).astype(np.float32)

    got_tokens, got_text = consumer.transcribe(wav)

    # Live pipeline on the same wav.
    feats = make_featurizer(fspec)(jnp.asarray(wav)[None, :])
    audio, _ = encoder_apply(params["encoder"], model_state["encoder"],
                             feats, spec.encoder, training=False)
    toks, counts = greedy_decode(
        {"predictor": params["predictor"], "joint": params["joint"]},
        audio, jnp.array([audio.shape[1]]), spec.predictor, spec.joint,
        max_tokens=15)
    want_tokens = list(np.asarray(toks)[0, : int(counts[0])])

    assert got_tokens == want_tokens
    assert 1 <= len(got_tokens) <= 15, "biased random model should emit a few tokens"
