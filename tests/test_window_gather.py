"""ops/window_gather.py: the Pallas arbitrary-start window fetch and the
banded one-hot lerp that replace per-element gathers in the device-side
augmentation ops (interpret mode on CPU; real Mosaic on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from rnnt_tpu.ops.window_gather import band_lerp, gather_windows


def test_gather_windows_exact():
    rng = np.random.RandomState(0)
    B, L, N, W = 3, 1000, 17, 256
    x = rng.randn(B, L).astype(np.float32)
    starts = rng.randint(0, L, (B, N)).astype(np.int32)
    out = np.asarray(gather_windows(jnp.asarray(x), jnp.asarray(starts), W))
    xp = np.pad(x, ((0, 0), (0, W + 128)))
    exp = np.stack([np.stack([xp[b, s:s + W] for s in starts[b]])
                    for b in range(B)])
    np.testing.assert_array_equal(out, exp)


def test_gather_windows_clips_and_pads():
    """Out-of-range starts clip to [0, L-1]; reads past L return zeros;
    N not a multiple of 8 round-trips."""
    x = jnp.asarray(np.arange(300, dtype=np.float32)[None, :])
    starts = jnp.asarray([[-5, 250, 299]], jnp.int32)
    out = np.asarray(gather_windows(x, starts, 128))
    assert out.shape == (1, 3, 128)
    np.testing.assert_array_equal(out[0, 0], np.arange(128))       # clip 0
    np.testing.assert_array_equal(out[0, 1, :50], np.arange(250, 300))
    assert np.all(out[0, 1, 50:] == 0.0)                           # zero pad
    assert out[0, 2, 0] == 299.0 and np.all(out[0, 2, 1:] == 0.0)


def test_band_lerp_matches_take_along_axis():
    rng = np.random.RandomState(1)
    B, N, W, C, s_lo, s_hi = 2, 9, 256, 128, -3, 5
    win = rng.randn(B, N, W).astype(np.float32)
    l = np.arange(C)[None, None, :]
    rel = (l + rng.uniform(s_lo, s_hi - 0.001, (B, N, C))).astype(np.float32)
    rel = np.clip(rel, 0, W - 1.001)
    y = np.asarray(band_lerp(jnp.asarray(win), jnp.asarray(rel), s_lo, s_hi))
    i0 = np.floor(rel).astype(int)
    f = rel - i0
    exp = (np.take_along_axis(win, i0, -1) * (1 - f)
           + np.take_along_axis(win, np.minimum(i0 + 1, W - 1), -1) * f)
    np.testing.assert_allclose(y, exp, atol=1e-6)


def test_band_lerp_out_of_band_reads_zero():
    """Positions whose floor falls outside [s_lo, s_hi] contribute nothing
    (graceful degradation, not garbage)."""
    win = jnp.ones((1, 1, 256), jnp.float32)
    rel = jnp.asarray(np.arange(128, dtype=np.float32)[None, None, :] + 50.0)
    y = np.asarray(band_lerp(win, rel, 0, 3))
    assert np.all(y == 0.0)


def test_gather_windows_width_validation():
    import pytest
    with pytest.raises(ValueError):
        gather_windows(jnp.zeros((1, 256)), jnp.zeros((1, 4), jnp.int32), 100)
