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
