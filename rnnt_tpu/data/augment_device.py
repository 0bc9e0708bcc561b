"""Device-side audio augmentation: the vectorizable half of the reference
recipe, fused into the jitted train step.

The 2-CPU TPU host feeds ~1114 audio-s/s with the full reference recipe
(bench.py --pipeline) against a chip consuming 3000-4000 audio-s/s — the
host is the end-to-end bottleneck.  Everything in the recipe that neither
changes the signal length nor needs data-dependent control flow moves here:
chorus (a gather + lerp), the compressor (block-RMS detector whose
attack/release followers are single-pole IIRs = associative scans), shaped
noise (a masked spectrum + irfft), white noise, and peak normalization.
The length-changing ops (atempo / pitch resample / trim) stay in host
workers (data/augment.py).

Semantics match the host implementations op-for-op (tests/
test_augment_device.py asserts allclose against data/augment.py on shared
parameters); sampling distributions match the reference recipe
(reference rnnt/augment.py + config/basic_sp_convjs_fullcausal.yaml:120-158).
All functions are jit-safe, batched over (B, L) audio, and leave samples
untouched beyond their ``audio_lens`` (the zero padding collation added).
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from rnnt_tpu.data.augment import (
    REFERENCE_CHORUS_FILTERS,
    REFERENCE_COMPRESSOR_FILTERS,
    augmentation_from_filter_string,
)


# ------------------------------ primitive ops ------------------------------

def chorus(audio, sample_rate: int, in_gain, out_gain, delay_ms, decay,
           speed, depth_ms):
    """Batched single-tap chorus.  audio (B, L); each param () or (B,).

    y[n] = in_gain*x[n] + out_gain*decay*x[n - D(n)],
    D(n) = (delay_ms + depth_ms*sin(2*pi*speed*n/sr)) * sr/1000, fractional
    delays linearly interpolated, out-of-range taps read 0 — exactly
    data/augment.py Chorus.apply."""
    B, L = audio.shape
    n = jnp.arange(L, dtype=jnp.float32)[None, :]
    as2 = lambda p: jnp.asarray(p, jnp.float32).reshape(-1, 1)
    d = as2(delay_ms) + as2(depth_ms) * jnp.sin(
        (2.0 * np.pi / sample_rate) * as2(speed) * n)
    src = n - d * (sample_rate / 1000.0)                    # (B, L)
    i0 = jnp.floor(src)
    frac = src - i0
    i0 = i0.astype(jnp.int32)
    x0 = jnp.take_along_axis(audio, jnp.clip(i0, 0, L - 1), axis=1)
    x1 = jnp.take_along_axis(audio, jnp.clip(i0 + 1, 0, L - 1), axis=1)
    # np.interp semantics (host Chorus): taps strictly outside [0, L-1]
    # read 0 as a whole — no cross-boundary lerp.
    tap = jnp.where((src >= 0) & (src <= L - 1),
                    x0 * (1.0 - frac) + x1 * frac, 0.0)
    wet = as2(decay) * tap
    return as2(in_gain) * audio + as2(out_gain) * wet


def _single_pole_iir(x, a, y0):
    """y[t] = a*y[t-1] + (1-a)*x[t] with y[-1] = y0, parallel in t.

    x (B, T), a () or (B,), y0 (B,).  The recurrence is an affine map
    y -> a*y + c per step; affine maps compose associatively, so the whole
    filter is one associative scan (O(log T) depth on TPU instead of a
    T-step lax.scan)."""
    B, T = x.shape
    a = jnp.broadcast_to(jnp.asarray(a, jnp.float32).reshape(-1, 1), (B, T))
    c = (1.0 - a) * x

    def combine(f, g):  # g applied after f: (m, c) = (m_f*m_g, c_f*m_g + c_g)
        return f[0] * g[0], f[1] * g[0] + g[1]

    m_scan, c_scan = jax.lax.associative_scan(combine, (a, c), axis=1)
    return m_scan * y0[:, None] + c_scan


def compressor(audio, sample_rate: int, threshold_db, ratio, attack_ms,
               release_ms, makeup=1.0):
    """Batched dynamic-range compressor — data/augment.py Compressor.apply:
    1 ms block RMS, max of attack/release single-pole followers, hard-knee
    gain above threshold, per-sample gains lerped between block centers."""
    B, L = audio.shape
    block = max(sample_rate // 1000, 1)
    nb = -(-L // block)
    x = jnp.pad(audio.astype(jnp.float32), ((0, 0), (0, nb * block - L)))
    rms = jnp.sqrt(jnp.mean(x.reshape(B, nb, block) ** 2, axis=2) + 1e-12)

    block_ms = 1000.0 * block / sample_rate
    as1 = lambda p: jnp.asarray(p, jnp.float32).reshape(-1)
    atk = jnp.exp(-block_ms / jnp.maximum(as1(attack_ms), 1e-3))
    rel = jnp.exp(-block_ms / jnp.maximum(as1(release_ms), 1e-3))
    fast = _single_pole_iir(rms, atk, rms[:, 0])
    slow = _single_pole_iir(rms, rel, rms[:, 0])
    env = jnp.maximum(fast, slow)

    level_db = 20.0 * jnp.log10(env)
    over = jnp.maximum(level_db - as1(threshold_db)[:, None], 0.0)
    gain_db = over * (1.0 / as1(ratio)[:, None] - 1.0)
    gains = (10.0 ** (gain_db / 20.0)) * jnp.asarray(makeup, jnp.float32)

    # np.interp(arange(L), centers, gains): centers = (i + 0.5) * block.
    pos = (jnp.arange(L, dtype=jnp.float32) - 0.5 * block) / block
    j0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, nb - 1)
    j1 = jnp.clip(j0 + 1, 0, nb - 1)
    frac = jnp.clip(pos - jnp.floor(pos), 0.0, 1.0)
    frac = jnp.where(pos < 0, 0.0, jnp.where(pos > nb - 1, 0.0, frac))
    g0 = jnp.take_along_axis(gains, jnp.broadcast_to(j0[None], (B, L)), 1)
    g1 = jnp.take_along_axis(gains, jnp.broadcast_to(j1[None], (B, L)), 1)
    g = g0 * (1.0 - frac[None, :]) + g1 * frac[None, :]
    return audio * g


def shape_noise(noise, ratios, level):
    """Shape white noise by a per-band spectral envelope and normalize its
    peak to ``level`` — the deterministic core of data/augment.py
    ShapedNoise.apply, batched.  noise (B, Lf) white in [0, 1); ratios
    (B, num_buckets) summing to 1; level (B,).  Returns (B, Lf)."""
    B, Lf = noise.shape
    num_buckets = ratios.shape[1]
    spec = jnp.fft.rfft(noise, axis=1)                     # (B, Lf//2+1)
    n_spec = spec.shape[1]
    band = n_spec // num_buckets
    nbb = num_buckets * band
    r0 = jnp.repeat(ratios, band, axis=1)                  # (B, nbb)
    r1 = jnp.repeat(jnp.concatenate(
        [ratios[:, 1:], jnp.zeros((B, 1), ratios.dtype)], axis=1), band,
        axis=1)
    frac = jnp.tile(jnp.linspace(0.0, 1.0, band), num_buckets)[None, :]
    env = jnp.sqrt(r0 + (r1 - r0) * frac)
    env_full = jnp.zeros((B, n_spec)).at[:, :nbb].set(env).at[:, 0].set(0.0)
    out = jnp.fft.irfft(spec * env_full, n=Lf, axis=1)
    peak = jnp.max(jnp.abs(out), axis=1, keepdims=True)
    return jnp.where(peak > 0, out / peak, 0.0) * \
        jnp.asarray(level, jnp.float32).reshape(-1, 1)


def peak_level(audio, lens, level):
    """Normalize each sample's (in-length) peak to ``level`` (B,) —
    data/augment.py PeakLevel.apply."""
    B, L = audio.shape
    mask = jnp.arange(L)[None, :] < lens[:, None]
    peak = jnp.max(jnp.abs(jnp.where(mask, audio, 0.0)), axis=1,
                   keepdims=True)
    scale = jnp.where(peak > 0,
                      jnp.asarray(level, jnp.float32).reshape(-1, 1) / peak,
                      1.0)
    return audio * scale


# --------------------------- recipe-driven sampler ---------------------------

def _filter_param_table(filters, keys):
    """Stack single-tap filter-string params into (n_variants,) arrays."""
    augs = [augmentation_from_filter_string(f) for f in filters]
    return {k: jnp.asarray([getattr(a, k) if not isinstance(getattr(a, k),
                                                            list)
                            else getattr(a, k)[0]
                            for a in augs], jnp.float32) for k in keys}


def _chorus_table():
    augs = [augmentation_from_filter_string(f)
            for f in REFERENCE_CHORUS_FILTERS]
    # Each reference chorus filter is single-tap.
    return {
        "in_gain": jnp.asarray([a.in_gain for a in augs], jnp.float32),
        "out_gain": jnp.asarray([a.out_gain for a in augs], jnp.float32),
        "delay_ms": jnp.asarray([a.taps[0][0] for a in augs], jnp.float32),
        "decay": jnp.asarray([a.taps[0][1] for a in augs], jnp.float32),
        "speed": jnp.asarray([a.taps[0][2] for a in augs], jnp.float32),
        "depth_ms": jnp.asarray([a.taps[0][3] for a in augs], jnp.float32),
    }


def _compressor_table():
    augs = [augmentation_from_filter_string(f)
            for f in REFERENCE_COMPRESSOR_FILTERS]
    return {
        "threshold_db": jnp.asarray([a.threshold_db for a in augs],
                                    jnp.float32),
        "ratio": jnp.asarray([a.ratio for a in augs], jnp.float32),
        "attack_ms": jnp.asarray([a.attack_ms for a in augs], jnp.float32),
        "release_ms": jnp.asarray([a.release_ms for a in augs], jnp.float32),
    }


def _gate(key, p: float, B: int):
    return jax.random.uniform(key, (B,)) < p


def _blend(applied, audio, on):
    return jnp.where(on[:, None], applied, audio)


def device_augment(rng, audio, audio_lens, sample_rate: int = 16000, *,
                   p: float = 0.5, noise_lo: float = 0.001,
                   noise_hi: float = 0.015, noise_buckets: int = 8,
                   peak_lo: float = 0.25, peak_hi: float = 0.99):
    """The device half of the reference fullcausal recipe
    (data/augment.py default_augmentor minus atempo/pitch/trim, same order):
    one-of-10 chorus, one-of-5 compressor, shaped noise, peak level — each
    applied per-sample with probability ``p``.  Jit-safe; samples stay
    untouched (zero) beyond audio_lens."""
    B, L = audio.shape
    keys = jax.random.split(rng, 9)
    audio = audio.astype(jnp.float32)
    orig_mask = jnp.arange(L)[None, :] < audio_lens[:, None]

    # Chorus: per-sample random variant.
    ct = _chorus_table()
    ci = jax.random.randint(keys[0], (B,), 0, len(REFERENCE_CHORUS_FILTERS))
    ch = chorus(audio, sample_rate, **{k: v[ci] for k, v in ct.items()})
    audio = _blend(ch, audio, _gate(keys[1], p, B))

    # Compressor: per-sample random variant.
    kt = _compressor_table()
    ki = jax.random.randint(keys[2], (B,), 0,
                            len(REFERENCE_COMPRESSOR_FILTERS))
    cp = compressor(audio, sample_rate, **{k: v[ki] for k, v in kt.items()})
    audio = _blend(cp, audio, _gate(keys[3], p, B))

    # Shaped noise at an FFT-friendly padded length (the noise is random,
    # so padding changes no semantics — same trick as the host's
    # next_fast_len).
    Lf = 1 << max(int(math.ceil(math.log2(max(L, 2)))), 1)
    noise = jax.random.uniform(keys[4], (B, Lf))
    ratios = jax.random.uniform(keys[5], (B, noise_buckets))
    ratios = ratios / jnp.sum(ratios, axis=1, keepdims=True)
    level = 10.0 ** jax.random.uniform(
        keys[6], (B,), minval=np.log10(noise_lo), maxval=np.log10(noise_hi))
    shaped = shape_noise(noise, ratios, level)[:, :L]
    audio = _blend(audio + shaped, audio, _gate(keys[7], p, B))

    # Peak level.
    lv_key, gate_key = jax.random.split(keys[8])
    level = jax.random.uniform(lv_key, (B,), minval=peak_lo, maxval=peak_hi)
    audio = _blend(peak_level(audio, audio_lens, level), audio,
                   _gate(gate_key, p, B))

    return jnp.where(orig_mask, audio, 0.0)


# Host-side augmentation kinds that device_augment replaces (used by the
# train loop to strip them from the host worker recipe when
# data.augment_device is on).
DEVICE_SIDE_KINDS = frozenset(
    {"chorus", "compressor", "choose_filter", "shaped_noise", "white_noise",
     "peak_level"})


def host_only_default_augmentor(seed: int = 0):
    """The length-changing remainder of the default recipe for host
    workers when device augmentation is enabled: atempo, pitch, trim."""
    from rnnt_tpu.data.augment import ATempo, Augmentor, PitchShift, Trim

    return Augmentor([
        ATempo(0.5, 0.75, 1.25),
        PitchShift(0.5, -3, 3),
        Trim(0.5, 0.02),
    ], seed=seed)
