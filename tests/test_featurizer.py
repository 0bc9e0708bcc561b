"""Featurizer parity and streaming tests.

The reference eyeballs golden STFT values between Python and JS
(rnnt/tests/test_featurizer.py, rnnt-js/featurizer.test.js); here parity is
automated against a torch.stft oracle, and chunked==full streaming
equivalence is asserted (reference rnnt-js/featurizer.test.js:31-71).
"""

import math

import numpy as np
import pytest
import torch

from rnnt_tpu.ops.stft import (
    FeatureStreamer,
    FeaturizerSpec,
    make_featurizer,
    old_piecewise_linear_log,
    piecewise_linear_log,
)


def _torch_power_stft(wave: np.ndarray, spec: FeaturizerSpec) -> np.ndarray:
    out = torch.stft(
        torch.from_numpy(wave),
        spec.n_fft, spec.hop_length, spec.win_length,
        window=torch.hann_window(spec.win_length),
        center=False, onesided=True, normalized=False, return_complex=True,
    )
    return (out.abs() ** 2).numpy().T  # (frames, bins)


@pytest.mark.parametrize("signal", ["ones", "sine"])
def test_power_stft_matches_torch(signal):
    spec = FeaturizerSpec(log_mode="log", mean=0.0, invstddev=1.0)
    n = 16000
    if signal == "ones":
        wave = np.ones(n, dtype=np.float32)
    else:
        t = np.arange(n) / 16000.0
        wave = np.sin(2 * np.pi * 4000 * t).astype(np.float32)

    featurize = make_featurizer(spec)
    ours = np.exp(np.asarray(featurize(wave))) - 1e-6  # undo log to compare power
    ref = _torch_power_stft(wave, spec)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-3)


def test_piecewise_linear_log_semantics():
    x = np.array([1e-6, 5e-3, 10e-3, 0.5, 10.0], dtype=np.float32)
    y = np.asarray(piecewise_linear_log(x))
    # Log branch above cutoff.
    np.testing.assert_allclose(y[3:], np.log(x[3:]), rtol=1e-4)
    # Linear branch below cutoff, continuous at the cutoff.
    intercept = math.log(10e-3) - 50.0 * 10e-3
    np.testing.assert_allclose(y[:2], 50.0 * x[:2] + intercept, rtol=1e-5)
    np.testing.assert_allclose(y[2], math.log(10e-3), rtol=1e-5)


def test_old_piecewise_log_semantics():
    gain = float(np.iinfo(np.int16).max) ** 2
    x = np.array([1e-12, 1e-9, 1e-3], dtype=np.float32)
    y = np.asarray(old_piecewise_linear_log(x))
    scaled = x * gain
    expected = np.where(scaled > math.e, np.log(scaled), scaled / math.e)
    np.testing.assert_allclose(y, expected, rtol=1e-5)


def test_mel_filterbank_shape_and_energy():
    spec = FeaturizerSpec(num_mels=80, log_mode="log", mean=0.0, invstddev=1.0)
    wave = np.random.RandomState(0).randn(16000).astype(np.float32)
    featurize = make_featurizer(spec)
    feats = np.asarray(featurize(wave))
    assert feats.shape == (spec.num_frames(16000), 80)
    assert np.isfinite(feats).all()


def test_per_channel_normalization():
    mean = tuple(np.linspace(0, 5, 201))
    inv = tuple(np.linspace(0.1, 1.0, 201))
    spec = FeaturizerSpec(mean=mean, invstddev=inv)
    base = FeaturizerSpec(mean=0.0, invstddev=1.0)
    wave = np.random.RandomState(1).randn(8000).astype(np.float32)
    raw = np.asarray(make_featurizer(base)(wave))
    norm = np.asarray(make_featurizer(spec)(wave))
    np.testing.assert_allclose(
        norm, (raw - np.asarray(mean)) * np.asarray(inv), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("chunk_size", [3200, 1600, 2000])
def test_streaming_equals_full(chunk_size):
    """Chunked featurizer output == full output, frame-exact
    (reference rnnt-js/featurizer.test.js:31-71)."""
    spec = FeaturizerSpec()
    wave = np.random.RandomState(2).randn(32000).astype(np.float32)
    full = np.asarray(make_featurizer(spec)(wave))

    streamer = FeatureStreamer(spec)
    frames = []
    for i in range(0, len(wave), chunk_size):
        out = streamer.process(wave[i:i + chunk_size])
        if out is not None:
            frames.append(out)
    streamed = np.concatenate(frames, axis=0)
    np.testing.assert_allclose(streamed, full[: len(streamed)], atol=1e-4)
    assert len(streamed) >= full.shape[0] - 1
