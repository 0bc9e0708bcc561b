"""Device-side augmentation (data/augment_device.py) vs the host DSP
(data/augment.py): op-for-op numerical parity on shared parameters, plus
jit-safety and padding discipline of the composed device_augment."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rnnt_tpu.data import augment as host
from rnnt_tpu.data import augment_device as dev

SR = 16000


@pytest.fixture(scope="module")
def audio():
    rng = np.random.RandomState(0)
    return (rng.randn(3, 8000).astype(np.float32) * 0.3)


@pytest.mark.parametrize("filter_str", host.REFERENCE_CHORUS_FILTERS[:3])
def test_chorus_matches_host(audio, filter_str):
    a = host.augmentation_from_filter_string(filter_str)
    expected = np.stack([a.apply(x, SR, np.random.RandomState(0))
                         for x in audio])
    delay, decay, speed, depth = a.taps[0]
    got = np.asarray(dev.chorus(jnp.asarray(audio), SR, a.in_gain,
                                a.out_gain, delay, decay, speed, depth))
    # f32 LFO sine vs the host's f64 shifts the fractional tap by ~1e-4
    # samples; bound the absolute error instead.
    np.testing.assert_allclose(got, expected, atol=3e-4)


@pytest.mark.parametrize("filter_str", host.REFERENCE_COMPRESSOR_FILTERS)
def test_compressor_matches_host(audio, filter_str):
    a = host.augmentation_from_filter_string(filter_str)
    expected = np.stack([a.apply(x, SR, np.random.RandomState(0))
                         for x in audio])
    got = np.asarray(dev.compressor(
        jnp.asarray(audio), SR, a.threshold_db, a.ratio, a.attack_ms,
        a.release_ms))
    np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-5)


def test_compressor_odd_block_size(audio):
    """The structured half-block gain lerp (round 4: replaces the 47 ms
    take_along_axis pair) must match the host np.interp at an ODD ms-block
    size too (sr=11025 -> block 11, crossover at r=5.5)."""
    sr = 11025
    a = host.augmentation_from_filter_string(
        host.REFERENCE_COMPRESSOR_FILTERS[0])
    expected = np.stack([a.apply(x, sr, np.random.RandomState(0))
                         for x in audio])
    got = np.asarray(dev.compressor(
        jnp.asarray(audio), sr, a.threshold_db, a.ratio, a.attack_ms,
        a.release_ms))
    np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-5)


def test_compressor_per_sample_params(audio):
    """Batched per-sample params must equal per-sample host application of
    the matching variant."""
    variants = [host.augmentation_from_filter_string(f)
                for f in host.REFERENCE_COMPRESSOR_FILTERS[:3]]
    expected = np.stack([v.apply(x, SR, np.random.RandomState(0))
                         for v, x in zip(variants, audio)])
    got = np.asarray(dev.compressor(
        jnp.asarray(audio), SR,
        np.asarray([v.threshold_db for v in variants], np.float32),
        np.asarray([v.ratio for v in variants], np.float32),
        np.asarray([v.attack_ms for v in variants], np.float32),
        np.asarray([v.release_ms for v in variants], np.float32)))
    np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-5)


def test_single_pole_iir_matches_scipy():
    from scipy.signal import lfilter

    rng = np.random.RandomState(1)
    x = rng.rand(2, 500).astype(np.float32)
    a = np.asarray([0.9, 0.99], np.float32)
    got = np.asarray(dev._single_pole_iir(jnp.asarray(x), a, x[:, 0]))
    for b in range(2):
        zi = np.array([x[b, 0] * a[b]])
        want, _ = lfilter([1.0 - a[b]], [1.0, -a[b]], x[b], zi=zi)
        np.testing.assert_allclose(got[b], want, rtol=1e-4, atol=1e-6)


def test_shape_noise_properties():
    rng = np.random.RandomState(2)
    noise = jnp.asarray(rng.rand(2, 4096).astype(np.float32))
    ratios = jnp.asarray(rng.rand(2, 8).astype(np.float32))
    ratios = ratios / ratios.sum(axis=1, keepdims=True)
    level = jnp.asarray([0.01, 0.002], jnp.float32)
    out = np.asarray(dev.shape_noise(noise, ratios, level))
    # Peak-normalized to the requested level; DC bin zeroed.
    np.testing.assert_allclose(np.abs(out).max(axis=1),
                               np.asarray(level), rtol=1e-4)
    assert np.all(np.abs(out.mean(axis=1)) < 1e-4)
    # Concentrating all envelope mass in the lowest band must shift the
    # output's spectral centroid down vs mass in the highest band.
    lo = np.zeros((1, 8), np.float32); lo[0, 0] = 1.0
    hi = np.zeros((1, 8), np.float32); hi[0, -1] = 1.0
    f = np.abs(np.fft.rfft(np.asarray(
        dev.shape_noise(noise[:1], jnp.asarray(lo), level[:1]))[0]))
    g = np.abs(np.fft.rfft(np.asarray(
        dev.shape_noise(noise[:1], jnp.asarray(hi), level[:1]))[0]))
    bins = np.arange(len(f))
    assert (f * bins).sum() / f.sum() < (g * bins).sum() / g.sum()


def test_peak_level_matches_host(audio):
    a = host.PeakLevel(1.0, 0.5, 0.5)  # deterministic level 0.5
    expected = np.stack([a.apply(x, SR, np.random.RandomState(0))
                         for x in audio])
    lens = jnp.full((3,), audio.shape[1], jnp.int32)
    got = np.asarray(dev.peak_level(jnp.asarray(audio), lens,
                                    jnp.full((3,), 0.5)))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_peak_level_ignores_padding(audio):
    """The peak must come from the in-length region only."""
    padded = np.concatenate(
        [audio, np.full((3, 100), 9.9, np.float32)], axis=1)
    lens = jnp.full((3,), audio.shape[1], jnp.int32)
    got = np.asarray(dev.peak_level(jnp.asarray(padded), lens,
                                    jnp.full((3,), 0.5)))
    np.testing.assert_allclose(np.abs(got[:, : audio.shape[1]]).max(axis=1),
                               0.5, rtol=1e-5)


def test_device_augment_jit_and_padding():
    rng = np.random.RandomState(3)
    audio = np.zeros((4, 6000), np.float32)
    lens = np.asarray([6000, 4000, 5000, 3000], np.int32)
    for i, l in enumerate(lens):
        audio[i, :l] = rng.randn(l) * 0.2

    fn = jax.jit(lambda k, a, l: dev.device_augment(k, a, l, SR))
    out = np.asarray(fn(jax.random.PRNGKey(0), jnp.asarray(audio),
                        jnp.asarray(lens)))
    assert out.shape == audio.shape and np.isfinite(out).all()
    # Zero padding must stay zero.
    for i, l in enumerate(lens):
        assert np.all(out[i, l:] == 0.0)
    # Deterministic given the key.
    out2 = np.asarray(fn(jax.random.PRNGKey(0), jnp.asarray(audio),
                         jnp.asarray(lens)))
    np.testing.assert_array_equal(out, out2)
    # A different key gives different augmentation.
    out3 = np.asarray(fn(jax.random.PRNGKey(1), jnp.asarray(audio),
                         jnp.asarray(lens)))
    assert np.abs(out - out3).max() > 0


def test_device_augment_p_gating():
    rng = np.random.RandomState(4)
    audio = jnp.asarray(rng.randn(2, 4000).astype(np.float32) * 0.2)
    lens = jnp.full((2,), 4000, jnp.int32)
    same = dev.device_augment(jax.random.PRNGKey(0), audio, lens, SR, p=0.0)
    np.testing.assert_allclose(np.asarray(same), np.asarray(audio),
                               rtol=1e-6, atol=1e-7)
    changed = dev.device_augment(jax.random.PRNGKey(0), audio, lens, SR,
                                 p=1.0)
    assert np.abs(np.asarray(changed) - np.asarray(audio)).max() > 1e-3


def test_train_step_with_device_augment():
    """make_loss_fn(device_augment=True) compiles and yields finite loss
    and grads; eval (training=False) is unaffected by the flag."""
    from rnnt_tpu.config.config import build_featurizer_spec, build_model_spec
    from rnnt_tpu.models.rnnt import rnnt_init
    from rnnt_tpu.train.step import make_loss_fn
    from tests.test_train_sharding import _batch, _tiny_cfg

    cfg = _tiny_cfg()
    spec = build_model_spec(cfg)
    fspec = build_featurizer_spec(cfg)
    params, model_state = rnnt_init(jax.random.PRNGKey(0), spec)
    batch = {k: jnp.asarray(v) for k, v in _batch(fspec, B=2).items()}
    loss_fn = make_loss_fn(spec, fspec, cfg.training.precision,
                           device_augment=True)

    def wrapped(p):
        loss, _ = loss_fn(p, model_state, batch, jax.random.PRNGKey(1), True)
        return loss

    loss, grads = jax.jit(jax.value_and_grad(wrapped))(params)
    assert np.isfinite(float(loss))
    assert all(np.all(np.isfinite(np.asarray(l)))
               for l in jax.tree_util.tree_leaves(grads))


# ------------------- length-changing ops (full mode) -------------------

def _assert_stretch_close(got, expected, hs=256):
    """Tight on the body; loose on the final window ramp, where the
    window^2 normalizer approaches its 1e-3 clamp and amplifies f32 FFT
    rounding differences (scipy vs XLA) into the few-percent range."""
    m = len(expected)
    np.testing.assert_allclose(got[: m - hs], expected[: m - hs], atol=4e-3)
    np.testing.assert_allclose(got[m - hs: m], expected[m - hs: m],
                               atol=5e-2)


def test_time_stretch_matches_host_unpadded():
    """Device phase vocoder == host _time_stretch when the sample fills the
    buffer (capacity L leaves room for the rate-0.75 slowdown)."""
    rng = np.random.RandomState(10)
    n, L = 8192, 16384
    x = (rng.randn(n) * 0.3).astype(np.float32)
    buf = np.zeros((1, L), np.float32)
    buf[0, :n] = x
    for rate in (1.25, 0.75, 1.1):
        expected = host._time_stretch(x, rate)
        out, new_lens = dev.time_stretch(
            jnp.asarray(buf), jnp.asarray([n], jnp.int32),
            jnp.asarray([rate], jnp.float32))
        got = np.asarray(out[0])
        assert int(new_lens[0]) == len(expected)
        _assert_stretch_close(got, expected)
        assert np.all(got[int(new_lens[0]):] == 0.0)


def test_time_stretch_matches_host_padded():
    """With padding, the device op must match the host op run on the
    unpadded signal (analysis positions never read past lens)."""
    rng = np.random.RandomState(11)
    L, n = 10240, 7000
    buf = np.zeros((1, L), np.float32)
    buf[0, :n] = (rng.randn(n) * 0.3).astype(np.float32)
    rate = 1.15
    expected = host._time_stretch(buf[0, :n], rate)
    out, new_lens = dev.time_stretch(
        jnp.asarray(buf), jnp.asarray([n], jnp.int32),
        jnp.asarray([rate], jnp.float32))
    assert int(new_lens[0]) == len(expected)
    _assert_stretch_close(np.asarray(out[0]), expected)


def test_time_stretch_slowdown_and_guards():
    """rate < 1 lengthens within capacity; short samples and rate~1 pass
    through unchanged (the host guard)."""
    rng = np.random.RandomState(12)
    L = 16384
    n = 8000
    buf = np.zeros((3, L), np.float32)
    row_lens = [n, 900, n]                              # zero beyond lens,
    for i, rl in enumerate(row_lens):                   # as collation does
        buf[i, :rl] = (rng.randn(rl) * 0.3).astype(np.float32)
    lens = jnp.asarray(row_lens, jnp.int32)             # 900 < 2*frame
    rates = jnp.asarray([0.8, 0.8, 1.0], jnp.float32)   # slow, guard, ~1
    out, new_lens = dev.time_stretch(jnp.asarray(buf), lens, rates)
    # Guarded rows come back bit-identical with unchanged lens.
    np.testing.assert_array_equal(np.asarray(out[1]), buf[1])
    np.testing.assert_array_equal(np.asarray(out[2]), buf[2])
    assert int(new_lens[1]) == 900 and int(new_lens[2]) == n
    # Slowdown row matches the host on the valid region.
    expected = host._time_stretch(buf[0, :n], 0.8)
    assert int(new_lens[0]) == len(expected)
    _assert_stretch_close(np.asarray(out[0]), expected)


def test_resample_lerp_oracle():
    """Device resample == an np.interp oracle at the same positions, and
    the length arithmetic matches floor(len/ratio)."""
    rng = np.random.RandomState(13)
    L, n = 6000, 5000
    buf = np.zeros((2, L), np.float32)
    buf[0, :n] = rng.randn(n).astype(np.float32) * 0.3
    buf[1, :n] = rng.randn(n).astype(np.float32) * 0.3
    ratios = np.asarray([2 ** (3 / 12), 2 ** (-1 / 12)], np.float32)
    out, new_lens = dev.resample_lerp(
        jnp.asarray(buf), jnp.asarray([n, n], jnp.int32),
        jnp.asarray(ratios))
    for b in range(2):
        m = int(new_lens[b])
        assert m == min(int(n / ratios[b]), L)
        src = np.arange(m, dtype=np.float32) * ratios[b]
        expected = np.interp(src, np.arange(L, dtype=np.float32), buf[b])
        np.testing.assert_allclose(np.asarray(out[b, :m]), expected,
                                   atol=2e-4)
        assert np.all(np.asarray(out[b, m:]) == 0.0)


def test_resample_lerp_band_edges():
    """The static interpolation band holds at the recipe extremes
    (±3 semitones) AND at the documented 1.27 edge — no silent mid-signal
    zeros (VERDICT r3 #7: at the old s_hi=35 band, ratio 1.27 pushed lane
    127's offset out of band)."""
    rng = np.random.RandomState(21)
    L, n = 6000, 5800
    ratios = np.asarray([2 ** (3 / 12), 2 ** (-3 / 12), 1.27, 0.72],
                        np.float32)
    B = len(ratios)
    buf = np.zeros((B, L), np.float32)
    # DC-offset signal: any silently-zeroed lane is instantly visible.
    buf[:, :n] = 1.0 + 0.1 * rng.randn(B, n).astype(np.float32)
    out, new_lens = dev.resample_lerp(
        jnp.asarray(buf), jnp.asarray([n] * B, jnp.int32),
        jnp.asarray(ratios))
    for b in range(B):
        m = int(new_lens[b])
        src = np.arange(m, dtype=np.float32) * ratios[b]
        expected = np.interp(src, np.arange(L, dtype=np.float32), buf[b])
        np.testing.assert_allclose(np.asarray(out[b, :m]), expected,
                                   atol=2e-4)


def test_resample_lerp_out_of_range_ratio_clamps():
    """Ratios beyond the band saturate at the documented clip instead of
    producing silent zeros."""
    L = 1024
    buf = jnp.ones((1, L), jnp.float32)
    out, new_lens = dev.resample_lerp(buf, jnp.asarray([L], jnp.int32),
                                      jnp.asarray([1.6], jnp.float32))
    m = int(new_lens[0])
    assert m == int(L / 1.275)        # clamped ratio drives the new length
    np.testing.assert_allclose(np.asarray(out[0, :m]), 1.0, atol=1e-5)


def test_warn_stripped_param_mismatch():
    warns = dev.warn_stripped_param_mismatch([
        {"kind": "atempo", "p": 0.5, "min_tempo_rate": 0.75,
         "max_tempo_rate": 1.25},                      # matches: no warning
        {"kind": "trim", "p": 0.9},                    # p differs
        {"kind": "white_noise", "p": 0.5},             # no device equivalent
    ])
    assert len(warns) == 2
    assert "trim" in warns[0] and "p=0.9" in warns[0]
    assert "white_noise" in warns[1]


def test_trim_matches_host():
    rng = np.random.RandomState(14)
    L, n = 4000, 3500
    buf = np.zeros((2, L), np.float32)
    buf[0, :n] = rng.randn(n).astype(np.float32)
    buf[1, :n] = rng.randn(n).astype(np.float32)
    n_trim = jnp.asarray([123, 5000], jnp.int32)  # second exceeds len: no-op
    out, new_lens = dev.trim(jnp.asarray(buf),
                             jnp.asarray([n, n], jnp.int32), n_trim)
    np.testing.assert_allclose(np.asarray(out[0, : n - 123]),
                               buf[0, 123:n], rtol=1e-6)
    assert int(new_lens[0]) == n - 123
    np.testing.assert_array_equal(np.asarray(out[1]), buf[1])
    assert int(new_lens[1]) == n


def test_device_augment_full_jit_padding_and_lens():
    rng = np.random.RandomState(15)
    audio = np.zeros((4, 16000), np.float32)
    lens = np.asarray([16000, 12000, 9000, 15000], np.int32)
    for i, l in enumerate(lens):
        audio[i, :l] = rng.randn(l) * 0.2

    fn = jax.jit(lambda k, a, l: dev.device_augment_full(k, a, l, SR))
    out, new_lens = fn(jax.random.PRNGKey(0), jnp.asarray(audio),
                       jnp.asarray(lens))
    out, new_lens = np.asarray(out), np.asarray(new_lens)
    assert out.shape == audio.shape and np.isfinite(out).all()
    assert np.all(new_lens >= 1) and np.all(new_lens <= audio.shape[1])
    for i in range(4):
        assert np.all(out[i, new_lens[i]:] == 0.0)
    # p=0 is the identity (audio AND lens).
    same, same_lens = dev.device_augment_full(
        jax.random.PRNGKey(0), jnp.asarray(audio), jnp.asarray(lens), SR,
        p=0.0)
    np.testing.assert_allclose(np.asarray(same), audio, rtol=1e-6,
                               atol=1e-7)
    np.testing.assert_array_equal(np.asarray(same_lens), lens)


def test_train_step_with_device_augment_full():
    """make_loss_fn(device_augment='full') compiles; loss/grads finite; the
    dynamic post-augment lengths flow into the loss masks."""
    from rnnt_tpu.config.config import build_featurizer_spec, build_model_spec
    from rnnt_tpu.models.rnnt import rnnt_init
    from rnnt_tpu.train.step import make_loss_fn
    from tests.test_train_sharding import _batch, _tiny_cfg

    cfg = _tiny_cfg()
    spec = build_model_spec(cfg)
    fspec = build_featurizer_spec(cfg)
    params, model_state = rnnt_init(jax.random.PRNGKey(0), spec)
    batch = {k: jnp.asarray(v) for k, v in _batch(fspec, B=2).items()}
    loss_fn = make_loss_fn(spec, fspec, cfg.training.precision,
                           device_augment="full")

    def wrapped(p):
        loss, _ = loss_fn(p, model_state, batch, jax.random.PRNGKey(1), True)
        return loss

    loss, grads = jax.jit(jax.value_and_grad(wrapped))(params)
    assert np.isfinite(float(loss))
    assert all(np.all(np.isfinite(np.asarray(l)))
               for l in jax.tree_util.tree_leaves(grads))
