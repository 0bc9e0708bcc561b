"""Host-side audio augmentation (numpy/scipy DSP — no ffmpeg dependency).

Capability parity with the reference's augmentation families (reference
rnnt/augment.py): probabilistic composition (:39-57), peak-level
normalization (:62-74), white noise with log-sampled level (:77-95), shaped
(band-enveloped) noise (:98-150), tempo change (:153-161), pitch shift via
rate change (:164-173), and leading-edge trim (:176-188).  The ffmpeg
filter-graph path (AudioEffector) is replaced by direct DSP so the input
pipeline has no external process dependency; these run in host workers and
never touch the device.  SpecAugment (the north-star extra) is device-side:
see ``spec_augment`` in this module.
"""

from __future__ import annotations

import numpy as np


class Augmentation:
    def __init__(self, p: float):
        self.p = p

    def apply(self, audio: np.ndarray, sample_rate: int,
              rng: np.random.RandomState) -> np.ndarray:
        raise NotImplementedError


class PeakLevel(Augmentation):
    """Normalize to a random peak level (reference rnnt/augment.py:62-74)."""

    def __init__(self, p: float, min_peak_level: float = 0.5,
                 max_peak_level: float = 1.0):
        super().__init__(p)
        self.lo, self.hi = min_peak_level, max_peak_level

    def apply(self, audio, sample_rate, rng):
        peak = np.abs(audio).max()
        if peak == 0:
            return audio
        level = rng.uniform(self.lo, self.hi)
        return audio / peak * level


class WhiteNoise(Augmentation):
    """Uniform noise, log-sampled level (reference rnnt/augment.py:77-95)."""

    def __init__(self, p: float, min_noise_level: float = 0.01,
                 max_noise_level: float = 0.1):
        super().__init__(p)
        self.lo, self.hi = min_noise_level, max_noise_level

    def apply(self, audio, sample_rate, rng):
        level = 10 ** rng.uniform(np.log10(self.lo), np.log10(self.hi))
        noise = rng.uniform(-level, level, size=audio.shape)
        return audio + noise.astype(audio.dtype)


class ShapedNoise(Augmentation):
    """White noise with a random per-band spectral envelope
    (reference rnnt/augment.py:98-150)."""

    def __init__(self, p: float, min_noise_level: float = 0.01,
                 max_noise_level: float = 0.1, num_buckets: int = 256):
        super().__init__(p)
        self.lo, self.hi = min_noise_level, max_noise_level
        self.num_buckets = num_buckets

    def apply(self, audio, sample_rate, rng):
        # Hot path on weak hosts: run the FFT at next_fast_len (an arbitrary
        # post-resample length can have large prime factors — measured 297 ms
        # vs 47 ms at len 188903 vs 160000 on the 2-CPU v5e host) and build
        # the per-band envelope vectorized instead of a 256-iteration Python
        # loop.  The noise is random, so padding changes no semantics.
        from scipy import fft as sfft

        level = 10 ** rng.uniform(np.log10(self.lo), np.log10(self.hi))
        n = len(audio)
        noise = rng.rand(n).astype(np.float32)
        ratios = rng.rand(self.num_buckets)
        ratios /= ratios.sum()
        nfft = sfft.next_fast_len(n, real=True)
        spec = sfft.rfft(noise, nfft)
        band = len(spec) // self.num_buckets
        nb = self.num_buckets * band
        # env over bucket i: linspace(ratios[i], ratios[i+1], band) ** 0.5
        r0 = np.repeat(ratios, band)
        r1 = np.repeat(np.append(ratios[1:], 0.0), band)
        frac = np.tile(np.linspace(0.0, 1.0, band), self.num_buckets)
        env = np.sqrt(r0 + (r1 - r0) * frac)
        shaped = np.zeros_like(spec)
        shaped[:nb] = spec[:nb] * env
        shaped[0] = 0
        out = sfft.irfft(shaped, nfft)[:n]
        peak = np.abs(out).max()
        if peak > 0:
            out = out / peak * level
        out = np.pad(out, (0, max(0, len(audio) - len(out))))[: len(audio)]
        return audio + out.astype(audio.dtype)


def _resample(audio: np.ndarray, ratio: float) -> np.ndarray:
    """Polyphase resample via scipy; ratio > 1 shortens (speeds up).

    The ratio is quantized to a small rational (max denominator 64, worst
    relative error ~2e-4 — inaudible for augmentation) so resample_poly's
    polyphase filter stays short; a 1000/997-style coprime pair designs a
    20k-tap filter and dominates the 2-CPU host's augmentation budget."""
    from fractions import Fraction

    from scipy.signal import resample_poly

    frac = Fraction(ratio).limit_denominator(64)
    up, down = frac.denominator, max(frac.numerator, 1)
    return resample_poly(audio, up, down).astype(audio.dtype)


class Tempo(Augmentation):
    """Tempo change (reference atempo, rnnt/augment.py:153-161).  Implemented
    as resampling — pitch shifts with tempo, matching the reference's
    asetrate-based PitchShift more than a phase-vocoder atempo; acceptable
    as a speed-perturbation augmentation (the classic 0.9/1.0/1.1 trick)."""

    def __init__(self, p: float, min_tempo_rate: float = 0.8,
                 max_tempo_rate: float = 1.2):
        super().__init__(p)
        self.lo, self.hi = min_tempo_rate, max_tempo_rate

    def apply(self, audio, sample_rate, rng):
        rate = rng.uniform(self.lo, self.hi)
        return _resample(audio, rate)


class PitchShift(Augmentation):
    """Pitch shift via rate change (reference asetrate trick,
    rnnt/augment.py:164-173)."""

    def __init__(self, p: float, min_semitones: int = -4,
                 max_semitones: int = 4):
        super().__init__(p)
        self.lo, self.hi = min_semitones, max_semitones

    def apply(self, audio, sample_rate, rng):
        semis = rng.randint(self.lo, self.hi + 1)
        return _resample(audio, 2.0 ** (semis / 12.0))


class Trim(Augmentation):
    """Trim a random slice off the start (reference rnnt/augment.py:176-188)."""

    def __init__(self, p: float, max_trim: float = 0.02):
        super().__init__(p)
        self.max_trim = max_trim

    def apply(self, audio, sample_rate, rng):
        trim = rng.uniform(0, self.max_trim)
        n = int(trim * sample_rate)
        return audio[n:] if n < len(audio) else audio


class Augmentor:
    """Probabilistic composition (reference TimeDomainAugmentor,
    rnnt/augment.py:27-59)."""

    def __init__(self, augmentations: list[Augmentation], seed: int = 0):
        self.augmentations = augmentations
        self.rng = np.random.RandomState(seed)

    def __call__(self, audio: np.ndarray, sample_rate: int,
                 rng: np.random.RandomState | None = None) -> np.ndarray:
        rng = rng if rng is not None else self.rng
        for aug in self.augmentations:
            if rng.rand() < aug.p:
                audio = aug.apply(audio, sample_rate, rng)
        return audio


def default_augmentor(seed: int = 0) -> Augmentor:
    """Composition mirroring the reference's fullcausal training recipe."""
    return Augmentor([
        Tempo(0.5, 0.75, 1.25),
        PitchShift(0.5, -3, 3),
        Trim(0.5, 0.02),
        PeakLevel(0.3),
        ShapedNoise(0.3),
        WhiteNoise(0.2),
    ], seed=seed)


def spec_augment(rng, features, *, num_time_masks: int = 2,
                 time_mask_width: int = 30, num_freq_masks: int = 2,
                 freq_mask_width: int = 27):
    """Device-side SpecAugment (time/freq masking) on (B, T, F) features —
    the north-star augmentation addition (BASELINE.json).  Jit-safe."""
    import jax
    import jax.numpy as jnp

    B, T, F = features.shape
    keys = jax.random.split(rng, 4)

    def mask_axis(x, key, axis_len, n_masks, width, axis):
        starts = jax.random.randint(key, (B, n_masks), 0, max(axis_len - width, 1))
        widths = jax.random.randint(
            jax.random.fold_in(key, 1), (B, n_masks), 0, width + 1)
        idx = jnp.arange(axis_len)[None, None, :]
        masked = (idx >= starts[..., None]) & (idx < (starts + widths)[..., None])
        mask = ~jnp.any(masked, axis=1)  # (B, axis_len)
        shape = [B, 1, 1]
        shape[axis] = axis_len
        return x * mask.reshape(shape).astype(x.dtype)

    features = mask_axis(features, keys[0], T, num_time_masks,
                         time_mask_width, axis=1)
    features = mask_axis(features, keys[1], F, num_freq_masks,
                         freq_mask_width, axis=2)
    return features
