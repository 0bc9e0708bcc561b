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


def test_band_lerp_chunked_matches_unchunked():
    """The lax.map N-chunking (HBM-spike guard) is numerically identical to
    the single-einsum path, including under grad."""
    rng = np.random.RandomState(7)
    B, N, W, C, s_lo, s_hi = 2, 11, 256, 128, -3, 5
    win = rng.randn(B, N, W).astype(np.float32)
    l = np.arange(C)[None, None, :]
    rel = np.clip(l + rng.uniform(s_lo, s_hi - 0.001, (B, N, C)),
                  0, W - 1.001).astype(np.float32)
    full = band_lerp(jnp.asarray(win), jnp.asarray(rel), s_lo, s_hi)
    chunked = band_lerp(jnp.asarray(win), jnp.asarray(rel), s_lo, s_hi,
                        max_chunk_bytes=B * 3 * C * (s_hi - s_lo + 2) * 4 * 2)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(full),
                               atol=1e-6)
    g_full = jax.grad(lambda w: band_lerp(w, jnp.asarray(rel),
                                          s_lo, s_hi).sum())(jnp.asarray(win))
    g_chunk = jax.grad(lambda w: band_lerp(
        w, jnp.asarray(rel), s_lo, s_hi,
        max_chunk_bytes=B * 3 * C * (s_hi - s_lo + 2) * 4 * 2).sum())(
        jnp.asarray(win))
    np.testing.assert_allclose(np.asarray(g_chunk), np.asarray(g_full),
                               atol=1e-6)


def test_gather_windows_width_validation():
    import pytest
    with pytest.raises(ValueError):
        gather_windows(jnp.zeros((1, 256)), jnp.zeros((1, 4), jnp.int32), 100)


def test_gather_windows_partitions_on_batch():
    """Under GSPMD with batch-sharded inputs the op partitions on the batch
    axis — no all-gather reconstructs the full batch (the pallas_call
    GSPMD-replication trap; VERDICT r3 #6).  Also parity vs unsharded."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from rnnt_tpu.parallel.mesh import make_mesh

    rng = np.random.RandomState(3)
    B, L, N, W = 8, 2048, 16, 256
    x = rng.randn(B, L).astype(np.float32)
    starts = rng.randint(0, L, (B, N)).astype(np.int32)

    mesh = make_mesh(8, 1)
    xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("data", None)))
    ss = jax.device_put(jnp.asarray(starts),
                        NamedSharding(mesh, P("data", None)))
    f = jax.jit(lambda x, s: gather_windows(x, s, W))
    hlo = f.lower(xs, ss).compile().as_text()
    bad = [ln for ln in hlo.splitlines() if "all-gather" in ln]
    assert not bad, "full-batch all-gather in HLO:\n" + "\n".join(bad)

    out = np.asarray(f(xs, ss))
    ref = np.asarray(gather_windows(jnp.asarray(x), jnp.asarray(starts), W))
    np.testing.assert_array_equal(out, ref)


def test_device_augment_full_under_mesh():
    """The ENTIRE device recipe (flagship default) jits and runs with
    batch-sharded audio on an 8-device data mesh, and stays finite."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from rnnt_tpu.data.augment_device import device_augment_full
    from rnnt_tpu.parallel.mesh import make_mesh

    rng = np.random.RandomState(4)
    B, L = 8, 16000
    n = 12000
    audio = np.zeros((B, L), np.float32)
    audio[:, :n] = rng.randn(B, n).astype(np.float32) * 0.3
    lens = np.full((B,), n, np.int32)

    mesh = make_mesh(8, 1)
    a = jax.device_put(jnp.asarray(audio),
                       NamedSharding(mesh, P("data", None)))
    ln = jax.device_put(jnp.asarray(lens), NamedSharding(mesh, P("data")))
    f = jax.jit(lambda r, a, ln: device_augment_full(r, a, ln))
    out, new_lens = f(jax.random.PRNGKey(0), a, ln)
    out = np.asarray(out)
    assert np.all(np.isfinite(out))
    for b in range(B):
        m = int(new_lens[b])
        assert 0 < m <= L
        assert np.all(out[b, m:] == 0.0)
