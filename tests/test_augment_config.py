"""Augmentation behavior tests (the reference's test_augment.py went stale
and no longer imports — SURVEY.md §4; these stay wired to the real API)
plus config-lineage loading tests.
"""

import numpy as np
import pytest

from rnnt_tpu.data.augment import (
    Augmentor,
    PeakLevel,
    PitchShift,
    ShapedNoise,
    Tempo,
    Trim,
    WhiteNoise,
    default_augmentor,
)


@pytest.fixture
def clip():
    rng = np.random.RandomState(0)
    t = np.arange(16000) / 16000.0
    return (0.5 * np.sin(2 * np.pi * 440 * t)
            + 0.05 * rng.randn(16000)).astype(np.float32)


def test_tempo_changes_length(clip):
    rng = np.random.RandomState(1)
    fast = Tempo(1.0, 1.2, 1.2).apply(clip, 16000, rng)
    slow = Tempo(1.0, 0.8, 0.8).apply(clip, 16000, rng)
    assert len(fast) < len(clip) < len(slow)
    np.testing.assert_allclose(len(fast), len(clip) / 1.2, rtol=0.01)


def test_pitch_shift_changes_length(clip):
    rng = np.random.RandomState(2)
    up = PitchShift(1.0, 3, 3).apply(clip, 16000, rng)
    assert len(up) < len(clip)  # asetrate-style: higher pitch = shorter


def test_trim_shortens(clip):
    rng = np.random.RandomState(3)
    out = Trim(1.0, 0.02).apply(clip, 16000, rng)
    assert len(clip) - 16000 * 0.02 <= len(out) <= len(clip)


def test_peak_level(clip):
    rng = np.random.RandomState(4)
    out = PeakLevel(1.0, 0.5, 0.5).apply(clip, 16000, rng)
    np.testing.assert_allclose(np.abs(out).max(), 0.5, rtol=1e-5)


def test_noise_adds_energy(clip):
    rng = np.random.RandomState(5)
    for aug in [WhiteNoise(1.0, 0.05, 0.05), ShapedNoise(1.0, 0.05, 0.05)]:
        out = aug.apply(clip.copy(), 16000, rng)
        assert out.shape == clip.shape
        assert not np.allclose(out, clip)


def test_probability_zero_is_identity(clip):
    aug = Augmentor([Tempo(0.0), WhiteNoise(0.0)], seed=0)
    np.testing.assert_array_equal(aug(clip.copy(), 16000), clip)


def test_default_augmentor_runs(clip):
    out = default_augmentor(seed=1)(clip.copy(), 16000)
    assert np.isfinite(out).all()


def test_all_configs_load_and_build():
    """Every shipped config must parse and build model+featurizer specs
    (the reference's basic_sp_convjs.yaml rotted: stale class names,
    SURVEY.md §5)."""
    from pathlib import Path

    from rnnt_tpu.config.config import (
        build_featurizer_spec,
        build_model_spec,
        load_config,
    )

    cfg_dir = Path("rnnt_tpu/config/configs")
    configs = sorted(cfg_dir.glob("*.yaml"))
    assert len(configs) >= 6
    for path in configs:
        cfg = load_config(path)
        spec = build_model_spec(cfg)
        fspec = build_featurizer_spec(cfg)
        assert spec.joint.num_classes == cfg.num_total_symbols
        assert fspec.num_bins > 0, path


def _dominant_freq(audio, sr=16000):
    spec = np.abs(np.fft.rfft(audio * np.hanning(len(audio))))
    return np.argmax(spec) * sr / len(audio)


def test_atempo_preserves_pitch(clip):
    """True atempo (reference rnnt/augment.py:153-161): duration scales by
    1/rate while the dominant frequency stays put — unlike the resampling
    Tempo, whose pitch follows the rate."""
    from rnnt_tpu.data.augment import ATempo

    rng = np.random.RandomState(7)
    for rate in (0.75, 1.25):
        out = ATempo(1.0, rate, rate).apply(clip, 16000, rng)
        np.testing.assert_allclose(len(out), len(clip) / rate, rtol=0.02)
        f = _dominant_freq(out)
        assert abs(f - 440.0) < 15.0, f"pitch moved to {f:.1f} Hz at rate {rate}"
    # Contrast: resampling Tempo shifts pitch by the rate.
    res = Tempo(1.0, 1.25, 1.25).apply(clip, 16000, rng)
    assert abs(_dominant_freq(res) - 550.0) < 15.0


def test_chorus_adds_modulated_copy(clip):
    from rnnt_tpu.data.augment import augmentation_from_filter_string

    rng = np.random.RandomState(8)
    aug = augmentation_from_filter_string("chorus=0.5:0.8:30:0.4:0.1:2")
    out = aug.apply(clip, 16000, rng)
    assert out.shape == clip.shape and np.isfinite(out).all()
    # Dry-only would be exactly 0.5*clip; the wet taps must contribute.
    assert not np.allclose(out, 0.5 * clip, atol=1e-4)
    # Tap should be audible but bounded.
    assert np.abs(out).max() < 2.0 * np.abs(clip).max()


def test_compressor_reduces_dynamic_range():
    from rnnt_tpu.data.augment import augmentation_from_filter_string

    rng = np.random.RandomState(9)
    sr = 16000
    t = np.arange(sr) / sr
    quiet = 0.02 * np.sin(2 * np.pi * 300 * t[: sr // 2])
    loud = 0.9 * np.sin(2 * np.pi * 300 * t[: sr // 2])
    x = np.concatenate([quiet, loud]).astype(np.float32)
    aug = augmentation_from_filter_string(
        "acompressor=threshold=-20dB:ratio=8:attack=2:release=50")
    out = aug.apply(x, sr, rng)
    ratio_in = np.abs(x[sr // 2:]).max() / np.abs(x[: sr // 2]).max()
    ratio_out = np.abs(out[sr // 2:]).max() / np.abs(out[: sr // 2]).max()
    assert ratio_out < 0.5 * ratio_in, (ratio_in, ratio_out)
    # Quiet part (below -20 dB threshold) passes ~unchanged.
    np.testing.assert_allclose(out[: sr // 4], x[: sr // 4], atol=5e-3)


def test_choose_filter_picks_each(clip):
    from rnnt_tpu.data.augment import ChooseAFilter

    rng = np.random.RandomState(10)
    aug = ChooseAFilter(1.0, ["chorus=0.5:0.8:30:0.4:0.1:2",
                              "acompressor=threshold=-20dB:ratio=4:attack=5:release=250"])
    outs = {tuple(np.round(aug.apply(clip, 16000, rng)[:50], 6))
            for _ in range(8)}
    assert len(outs) >= 2  # both branches exercised


def test_build_augmentor_from_yaml_dicts(clip):
    from rnnt_tpu.data.augment import build_augmentor

    stack = [
        {"kind": "atempo", "p": 1.0, "min_tempo_rate": 1.1, "max_tempo_rate": 1.1},
        {"kind": "choose_filter", "p": 1.0,
         "filters": ["chorus=0.5:0.8:30:0.4:0.1:2"]},
        {"kind": "peak_level", "p": 1.0, "min_peak_level": 0.5,
         "max_peak_level": 0.5},
    ]
    out = build_augmentor(stack, seed=0)(clip.copy(), 16000)
    assert np.isfinite(out).all()
    np.testing.assert_allclose(np.abs(out).max(), 0.5, rtol=1e-4)
    np.testing.assert_allclose(len(out), len(clip) / 1.1, rtol=0.02)

    with pytest.raises(ValueError, match="unknown augmentation kind"):
        build_augmentor([{"kind": "nope", "p": 1.0}])


def test_default_augmentor_matches_reference_recipe(clip):
    """default_augmentor mirrors the fullcausal stack: 7 stages, atempo
    first, chorus+compressor choosers present."""
    from rnnt_tpu.data.augment import ATempo, ChooseAFilter

    aug = default_augmentor(seed=2)
    kinds = [type(a).__name__ for a in aug.augmentations]
    assert kinds == ["ATempo", "PitchShift", "Trim", "ChooseAFilter",
                     "ChooseAFilter", "ShapedNoise", "PeakLevel"]
    out = aug(clip.copy(), 16000)
    assert np.isfinite(out).all()
