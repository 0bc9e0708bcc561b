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
from rnnt_tpu.ops.window_gather import band_lerp, gather_windows


# ------------------------------ primitive ops ------------------------------

def chorus(audio, sample_rate: int, in_gain, out_gain, delay_ms, decay,
           speed, depth_ms):
    """Batched single-tap chorus.  audio (B, L); each param () or (B,).

    y[n] = in_gain*x[n] + out_gain*decay*x[n - D(n)],
    D(n) = (delay_ms + depth_ms*sin(2*pi*speed*n/sr)) * sr/1000, fractional
    delays linearly interpolated, out-of-range taps read 0 — exactly
    data/augment.py Chorus.apply.

    TPU path: the fractional-delay read is NOT a per-element gather
    (~22 ns/element on v5e — ~56 ms at (32, 80000)).  The LFO drifts by
    < 1 sample per 128-sample block (reference table worst case
    2*pi*0.1Hz*8ms*16*128/16000 = 0.64), so each 128-lane output block
    reads one contiguous window anchored at its first tap
    (ops/window_gather.py Pallas fetch) and the per-lane offsets stay in a
    4-wide static band resolved by a constant one-hot einsum (band_lerp).
    """
    B, L = audio.shape
    Lp = -(-L // 128) * 128
    PAD = 1024   # > max delay+depth (48 ms * 16 = 768 samples)
    a_p = jnp.pad(audio.astype(jnp.float32), ((0, 0), (PAD, Lp - L)))
    n = jnp.arange(Lp, dtype=jnp.float32)[None, :]
    as2 = lambda p: jnp.asarray(p, jnp.float32).reshape(-1, 1)
    d = as2(delay_ms) + as2(depth_ms) * jnp.sin(
        (2.0 * np.pi / sample_rate) * as2(speed) * n)
    src = jnp.broadcast_to(n - d * (sample_rate / 1000.0), (B, Lp))
    nb = Lp // 128
    w0 = jnp.floor(src[:, ::128]).astype(jnp.int32) - 1     # (B, nb)
    win = gather_windows(a_p, w0 + PAD, 256)
    rel = src - jnp.repeat(w0, 128, axis=1).astype(jnp.float32)
    tap = band_lerp(win, rel.reshape(B, nb, 128), 0, 3).reshape(B, Lp)
    tap = tap[:, :L]
    src = src[:, :L]
    # np.interp semantics (host Chorus): taps strictly outside [0, L-1]
    # read 0 as a whole — no cross-boundary lerp.
    tap = jnp.where((src >= 0) & (src <= L - 1), tap, 0.0)
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
    # The sample->block mapping is REGULAR (sample t = block*k + r reads
    # blocks k-1/k for r < block/2, k/k+1 otherwise), so the interp is a
    # shifted-neighbor lerp over (B, nb, block) — pure broadcasting, no
    # take_along_axis (a (B, L) per-element gather runs at ~11 ns/element
    # on v5e: 2 gathers cost 47 ms of the 51 ms partial recipe; this whole
    # op is < 1 ms without them).
    nlo = (block + 1) // 2                    # r < block/2 uses blocks k-1/k
    hb = 0.5 * block
    g_prev = jnp.concatenate([gains[:, :1], gains[:, :-1]], axis=1)
    g_next = jnp.concatenate([gains[:, 1:], gains[:, -1:]], axis=1)
    r = jnp.arange(block, dtype=jnp.float32)
    fr_lo = ((r[:nlo] + hb) / block)[None, None, :]
    fr_hi = ((r[nlo:] - hb) / block)[None, None, :]
    lo = (g_prev[:, :, None] * (1.0 - fr_lo) + gains[:, :, None] * fr_lo)
    hi = (gains[:, :, None] * (1.0 - fr_hi) + g_next[:, :, None] * fr_hi)
    g = jnp.concatenate([lo, hi], axis=2).reshape(B, nb * block)[:, :L]
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


# --------------------- length-changing ops (full mode) ---------------------
#
# The host recipe's remaining three ops (atempo / pitch / trim) CHANGE the
# signal length, which looks jit-hostile — but only shapes must be static
# under XLA, not values.  Each op below keeps the padded (B, L) buffer and
# returns updated ``lens``; downstream consumers (featurizer length
# arithmetic, peak normalization, loss masks) already run off dynamic
# lengths.  Slowdowns that would overflow the bucket buffer are clamped to
# capacity (rate >= len/L) — a deviation from the host recipe only for
# utterances that nearly fill their bucket.


def resample_lerp(audio, lens, ratio):
    """Batched rate-change resample: out[i] = x(i*ratio), pitch follows rate
    (the reference's asetrate trick, reference rnnt/augment.py:164-173).
    audio (B, L), lens (B,) int, ratio (B,) > 0; returns (out, new_lens)
    with new_len = floor(len/ratio) clamped to L.

    Deviates from the host's polyphase interpolator (data/augment.py
    _resample) only in the interpolation kernel (linear vs windowed-sinc);
    at the augmentation ratios used (2**(±3/12)) the difference is
    inaudible aliasing."""
    B, L = audio.shape
    Lp = -(-L // 128) * 128
    a_p = jnp.pad(audio.astype(jnp.float32), ((0, 0), (128, Lp - L)))
    # 64-lane output blocks anchored at the MIDDLE lane: per-lane offsets
    # are 48 - 32r + l(r-1) + frac over l in [0, 64), inside the static
    # band [6, 27] for ratio in [0.677, 1.3125] — the clip below makes
    # out-of-band reads impossible by construction (wider ratios saturate
    # instead of silently zeroing; tests cover ±3 st and the 1.27 edge).
    # vs the old 128-lane lane-0 anchor (band width 74): the banded one-hot
    # einsum shrinks 4x in FLOPs and 6x in intermediates (no lax.map
    # chunking), ~7 ms -> ~1.5 ms at (32, 80000).
    r = jnp.clip(jnp.asarray(ratio, jnp.float32), 0.71, 1.275).reshape(-1, 1)
    src = jnp.broadcast_to(
        jnp.arange(Lp, dtype=jnp.float32)[None, :] * r, (B, Lp))
    nb = Lp // 64
    w0 = jnp.floor(src[:, 32::64]).astype(jnp.int32) - 48
    win = gather_windows(a_p, w0 + 128, 128)
    rel = src - jnp.repeat(w0, 64, axis=1).astype(jnp.float32)
    out = band_lerp(win, rel.reshape(B, nb, 64), 6, 27).reshape(B, Lp)
    out = out[:, :L]
    new_lens = jnp.minimum((lens.astype(jnp.float32) / r[:, 0]),
                           float(L)).astype(jnp.int32)
    out = jnp.where(jnp.arange(L)[None, :] < new_lens[:, None], out, 0.0)
    return out, new_lens


def trim(audio, lens, n_trim):
    """Drop ``n_trim`` samples off the start (reference
    rnnt/augment.py:176-188: no-op when n_trim >= len).  audio (B, L),
    n_trim (B,) int; returns (out, new_lens).

    The per-row shift is fetched as contiguous 128-wide windows
    (ops/window_gather.py) — a take_along_axis here was a (B, L)
    per-element gather costing ~29 ms at (32, 80000) vs ~3 ms now."""
    B, L = audio.shape
    applied = n_trim < lens
    shift = jnp.where(applied, n_trim, 0)
    nb = -(-L // 128)
    starts = shift[:, None] + 128 * jnp.arange(nb, dtype=jnp.int32)[None, :]
    out = gather_windows(audio.astype(jnp.float32), starts,
                         128).reshape(B, nb * 128)[:, :L]
    new_lens = lens - shift
    out = jnp.where(jnp.arange(L)[None, :] < new_lens[:, None], out, 0.0)
    return out, new_lens


def time_stretch(audio, lens, rate, frame: int = 512):
    """Batched pitch-preserving time stretch — the device phase vocoder
    matching data/augment.py _time_stretch sample-for-sample (same analysis
    positions, princarg phase propagation, hop-frame/2 overlap-add).
    audio (B, L), lens (B,) int, rate (B,); returns (out, new_lens) with
    new_len = floor(len/rate).  Samples with len < 2*frame or
    |rate-1| < 1e-3 pass through unchanged (the host guard)."""
    B, L = audio.shape
    hs = frame // 2
    M = max((L - frame) // hs + 1, 2)
    k = jnp.arange(frame, dtype=jnp.float32)
    window = 0.5 - 0.5 * jnp.cos(2.0 * np.pi * k / (frame - 1))  # np.hanning
    n = lens.astype(jnp.float32)
    r = jnp.asarray(rate, jnp.float32)
    out_len = jnp.floor(n / r).astype(jnp.int32)
    m = jnp.maximum((out_len - frame) // hs + 1, 2)              # (B,)

    i = jnp.arange(M, dtype=jnp.float32)[None, :]
    pos = jnp.minimum(jnp.floor(i * (hs * r[:, None])),
                      n[:, None] - frame)
    pos = jnp.maximum(pos, 0.0).astype(jnp.int32)                # (B, M)

    # Analysis frames are contiguous windows at arbitrary starts — the
    # Pallas window fetch (ops/window_gather.py) instead of a 10M-element
    # XLA gather.
    frames = gather_windows(audio.astype(jnp.float32), pos, frame)
    spec = jnp.fft.rfft(frames * window, axis=-1)                # (B,M,F/2+1)
    mag = jnp.abs(spec)
    phase = jnp.angle(spec)
    omega = (2.0 * np.pi / frame) * jnp.arange(frame // 2 + 1,
                                               dtype=jnp.float32)
    ha = jnp.diff(pos, axis=1).astype(jnp.float32)[:, :, None]   # (B,M-1,1)
    dphi = phase[:, 1:] - phase[:, :-1] - omega[None, None, :] * ha
    dphi -= 2.0 * np.pi * jnp.round(dphi / (2.0 * np.pi))        # princarg
    inst = omega[None, None, :] + dphi / jnp.maximum(ha, 1.0)
    psi = jnp.concatenate(
        [phase[:, :1], phase[:, :1] + jnp.cumsum(inst * hs, axis=1)], axis=1)
    out_frames = jnp.fft.irfft(mag * jnp.exp(1j * psi), frame,
                               axis=-1) * window

    # Overlap-add at hop hs == frame/2: two shifted padded adds; frames at
    # i >= m (beyond this sample's output) are masked out of both the
    # signal accumulator and the window^2 normalizer.
    fmask = (jnp.arange(M)[None, :] < m[:, None])[:, :, None]
    of = jnp.where(fmask, out_frames, 0.0)
    acc = (jnp.pad(of[:, :, :hs], ((0, 0), (0, 1), (0, 0)))
           + jnp.pad(of[:, :, hs:], ((0, 0), (1, 0), (0, 0))))
    acc = acc.reshape(B, (M + 1) * hs)
    w2 = jnp.broadcast_to((window * window)[None, None, :], (B, M, frame))
    w2 = jnp.where(fmask, w2, 0.0)
    wacc = (jnp.pad(w2[:, :, :hs], ((0, 0), (0, 1), (0, 0)))
            + jnp.pad(w2[:, :, hs:], ((0, 0), (1, 0), (0, 0))))
    wacc = wacc.reshape(B, (M + 1) * hs)
    out = acc / jnp.maximum(wacc, 1e-3)
    if (M + 1) * hs >= L:
        out = out[:, :L]
    else:
        out = jnp.pad(out, ((0, 0), (0, L - (M + 1) * hs)))

    # The host's OLA buffer holds (m+1)*hs samples, so its output is
    # min(out_len, (m+1)*hs) — match that exactly.
    new_lens = jnp.minimum(jnp.minimum(out_len, (m + 1) * hs), L)
    skip = (lens < 2 * frame) | (jnp.abs(r - 1.0) < 1e-3)
    out = jnp.where(skip[:, None], audio, out)
    new_lens = jnp.where(skip, lens, new_lens)
    out = jnp.where(jnp.arange(L)[None, :] < new_lens[:, None], out, 0.0)
    return out, new_lens


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


def device_augment_full(rng, audio, audio_lens, sample_rate: int = 16000, *,
                        p: float = 0.5, **kwargs):
    """The ENTIRE reference fullcausal recipe on device
    (data/augment.py default_augmentor, same order): atempo, pitch shift,
    trim, chorus, compressor, shaped noise, peak — host workers then only
    decode/tokenize/collate.  Returns (audio, new_lens); downstream length
    arithmetic must use new_lens.

    Slowdown rates are clamped to the bucket buffer capacity
    (rate >= len/L); this only deviates from the host recipe for
    utterances that nearly fill their bucket."""
    B, L = audio.shape
    keys = jax.random.split(rng, 7)
    audio = audio.astype(jnp.float32)
    lens = audio_lens.astype(jnp.int32)

    # ATempo(0.5, 0.75, 1.25): pitch-preserving tempo.
    rate = jax.random.uniform(keys[0], (B,), minval=0.75, maxval=1.25)
    rate = jnp.maximum(rate, lens.astype(jnp.float32) / L)
    st, sl = time_stretch(audio, lens, rate)
    on = _gate(keys[1], p, B)
    audio = _blend(st, audio, on)
    lens = jnp.where(on, sl, lens)

    # PitchShift(0.5, -3, 3): rate-change resample, 2**(semis/12).
    semis = jax.random.randint(keys[2], (B,), -3, 4)
    ratio = 2.0 ** (semis.astype(jnp.float32) / 12.0)
    ratio = jnp.maximum(ratio, lens.astype(jnp.float32) / L)
    rs, rl = resample_lerp(audio, lens, ratio)
    on = _gate(keys[3], p, B)
    audio = _blend(rs, audio, on)
    lens = jnp.where(on, rl, lens)

    # Trim(0.5, 0.02).
    n_trim = (jax.random.uniform(keys[4], (B,), maxval=0.02)
              * sample_rate).astype(jnp.int32)
    tr, tl = trim(audio, lens, n_trim)
    on = _gate(keys[5], p, B)
    audio = _blend(tr, audio, on)
    lens = jnp.where(on, tl, lens)

    audio = device_augment(keys[6], audio, lens, sample_rate, p=p, **kwargs)
    return audio, lens


# Host-side augmentation kinds that device_augment replaces (used by the
# train loop to strip them from the host worker recipe when
# data.augment_device is on).
DEVICE_SIDE_KINDS = frozenset(
    {"chorus", "compressor", "choose_filter", "shaped_noise", "white_noise",
     "peak_level"})

# Additionally replaced in "full" mode (data.augment_device: full).
DEVICE_SIDE_KINDS_FULL = DEVICE_SIDE_KINDS | frozenset(
    {"atempo", "tempo", "pitch_shift", "trim"})

# The parameters the device recipe actually runs (hard-coded in
# device_augment / device_augment_full).  When the train loop strips a
# host-side op whose config differs from these, the user's parameters are
# silently discarded — warn_stripped_param_mismatch makes that loud.
DEVICE_RECIPE_PARAMS = {
    "atempo": {"p": 0.5, "min_tempo_rate": 0.75, "max_tempo_rate": 1.25},
    "tempo": {"p": 0.5, "min_tempo_rate": 0.75, "max_tempo_rate": 1.25},
    "pitch_shift": {"p": 0.5, "min_semitones": -3, "max_semitones": 3},
    "trim": {"p": 0.5, "max_trim": 0.02},
    "choose_filter": {"p": 0.5},
    "chorus": {"p": 0.5},
    "compressor": {"p": 0.5},
    "shaped_noise": {"p": 0.5, "min_noise_level": 0.001,
                     "max_noise_level": 0.015, "num_buckets": 8},
    "white_noise": None,       # not in the device recipe at all
    "peak_level": {"p": 0.5, "min_peak_level": 0.25,
                   "max_peak_level": 0.99},
}


def warn_stripped_param_mismatch(stripped_cfgs) -> list[str]:
    """Compare host augmentation configs stripped by the train loop against
    the parameters the device recipe hard-codes; return (and print) a
    warning line per mismatch so custom per-op settings are never silently
    discarded (train/loop.py calls this when data.augment_device is on)."""
    warnings = []
    for c in stripped_cfgs:
        kind = c.get("kind")
        expect = DEVICE_RECIPE_PARAMS.get(kind)
        if expect is None:
            warnings.append(
                f"augment_device: host op {kind!r} has no device "
                f"equivalent with these semantics — it will NOT run")
            continue
        diffs = {k: (v, expect[k]) for k, v in c.items()
                 if k != "kind" and k in expect and v != expect[k]}
        extra = [k for k in c if k not in expect and k != "kind"
                 and k != "filters"]
        if diffs or extra:
            parts = [f"{k}={got!r} (device runs {want!r})"
                     for k, (got, want) in diffs.items()]
            parts += [f"{k}={c[k]!r} (ignored)" for k in extra]
            warnings.append(
                f"augment_device: stripped host op {kind!r} config differs "
                f"from the device recipe: " + ", ".join(parts))
    for w in warnings:
        print(f"WARNING: {w}")
    return warnings


def host_only_default_augmentor(seed: int = 0):
    """The length-changing remainder of the default recipe for host
    workers when device augmentation is enabled: atempo, pitch, trim."""
    from rnnt_tpu.data.augment import ATempo, Augmentor, PitchShift, Trim

    return Augmentor([
        ATempo(0.5, 0.75, 1.25),
        PitchShift(0.5, -3, 3),
        Trim(0.5, 0.02),
    ], seed=seed)
